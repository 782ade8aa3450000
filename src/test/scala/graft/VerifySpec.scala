package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Pins Verify's failure contract: a query that fails to build or run must
  * APPEAR in the correctness dump (err-marker parquet + errors.json entry),
  * never silently vanish — the round-8 dump shrank 139→133 on ten analysis
  * errors and read as all-green.
  */
class VerifySpec extends SparkSpec {

  private def rmrf(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  test("a failing query emits an err row and an errors.json entry, not a vanished one") {
    val out = Files.createTempDirectory("graft_verify_spec_")
    try {
      val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
        "q_ok" -> ((s, _) => { import s.implicits._; Seq(1L).toDF("one") }),
        // deliberately broken: unresolivable column → analysis error
        "q_broken" -> ((s, d) => Tables(s, d).events.select(col("no_such_column"))))
      val errs = Verify.dump(spark, sfDir, out.toString, queries)

      assert(errs.keySet == Set("q_broken"), s"unexpected error set: $errs")
      assert(errs("q_broken").startsWith("err:"), errs("q_broken"))

      // the err marker occupies the query's own slot in the dump, so the
      // driver's compare produces an explicit mismatching row
      val marker = spark.read.parquet(s"$out/q_broken")
      assert(marker.columns.toSeq == Seq("err"))
      assert(marker.count() == 1)
      assert(marker.head().getString(0).startsWith("err:"))

      val json = Files.readString(Paths.get(s"$out/errors.json"))
      assert(json.contains("\"q_broken\"") && json.contains("err:"), json)

      // the healthy query still dumps normally alongside the failure
      assert(spark.read.parquet(s"$out/q_ok").count() == 1)
    } finally rmrf(out)
  }

  test("a clean dump writes an empty errors.json") {
    val out = Files.createTempDirectory("graft_verify_spec_")
    try {
      val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
        "q_ok" -> ((s, _) => { import s.implicits._; Seq(1L).toDF("one") }))
      val errs = Verify.dump(spark, sfDir, out.toString, queries)
      assert(errs.isEmpty)
      assert(Files.readString(Paths.get(s"$out/errors.json")) == "{}")
    } finally rmrf(out)
  }
}
