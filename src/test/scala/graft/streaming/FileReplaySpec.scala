package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit, timestamp_millis}
import org.apache.spark.sql.types._

/** Pins fileReplay's temp-dir lifecycle: the replay root (sources,
  * checkpoint, sink output) must be reclaimed on BOTH the success path and
  * the failure path — a twin that dies mid-replay must not leak its
  * staging directories into /tmp across a 143-query verify run.
  */
class FileReplaySpec extends SparkSpec {

  private def twinDirs(): Set[String] =
    Option(new java.io.File(System.getProperty("java.io.tmpdir")).listFiles())
      .getOrElse(Array.empty)
      .collect { case f if f.getName.startsWith("graft_twin_") => f.getName }
      .toSet

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("v", LongType)))

  private def frame = {
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("v")
      .select(timestamp_millis(lit(1700000000000L) + col("v")).as("ts"), col("v"))
  }

  test("a failing transform still reclaims the replay temp root") {
    val before = twinDirs()
    val e = intercept[RuntimeException] {
      StreamingQueries.fileReplay(spark, Seq(schema -> Seq(frame, frame)),
        _ => throw new RuntimeException("boom: transform refused to build"))
    }
    assert(e.getMessage.contains("boom"))
    assert(twinDirs() == before,
      s"leaked replay dirs: ${(twinDirs() -- before).mkString(", ")}")
  }

  test("a successful replay reclaims the temp root and the result survives it") {
    val before = twinDirs()
    val out = StreamingQueries.fileReplay(spark, Seq(schema -> Seq(frame, frame)),
      srcs => srcs.head.select(col("v")))
    // localCheckpoint'ed result is readable AFTER the temp dirs are gone
    assert(out.count() == 6)
    assert(twinDirs() == before,
      s"leaked replay dirs: ${(twinDirs() -- before).mkString(", ")}")
  }
}
