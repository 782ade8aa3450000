package graft

import java.nio.file.Files

import graft.operators.Dedup
import graft.lake.{LakeCatalog, TableMerger}
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: a 100 TB pipeline constantly sees empty
  * sources, empty partitions, and single-element groups — operators must
  * pass them through, not throw.
  */
class EdgeCasesSpec extends SparkSpec {

  import spark.implicits._

  test("directory scan of an empty/missing layout returns no tables") {
    val empty = Files.createTempDirectory("graft_empty").toString
    assert(graft.sources.MultiFormatReader.loadDirectory(spark, empty).isEmpty)
    assert(graft.sources.MultiFormatReader.loadDirectory(spark, "/nonexistent/dir").isEmpty)
  }

  test("connected components of an empty pair list is empty") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.duplicateClusters(pairs).count() == 0)
  }

  test("minhash signatures handle single-token and empty-ish documents") {
    val docs = Seq((1L, "word"), (2L, "a b"), (3L, "   ")).toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"),
      Dedup.minhashSignature(Dedup.shingleHashes(col("text"))).as("sig"))
    assert(sigs.filter(size(col("sig")) =!= Dedup.NumPerms).count() == 0)
  }

  test("merging an empty delta leaves the target unchanged") {
    val cat = LakeCatalog(spark, Files.createTempDirectory("graft_elake").toString)
    val merger = new TableMerger(cat)
    merger.mergeTable(Seq((1, "a")).toDF("id", "v"), "ns", "t")
    val r = merger.mergeTable(Seq.empty[(Int, String)].toDF("id", "v"), "ns", "t")
    assert(r.sourceRows == 0)
    assert(r.finalRows == 1)
  }

  test("simhash of empty text is stable, fingerprint of empty text is stable") {
    val df = Seq(("", ""), ("", "")).toDF("t1", "t2")
    val rows = df.select(Dedup.simhash64(col("t1")),
      graft.operators.TextAnalysis.fingerprint(col("t2"))).collect()
    assert(rows(0) == rows(1))
  }

  test("streaming sessionize on empty input emits nothing (batch mode)") {
    import graft.streaming.EventStreams
    val empty = Seq.empty[EventStreams.Event].toDS()
    assert(EventStreams.sessionize(empty).count() == 0)
  }
}
