package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("ngramsOf: sliding joined windows; short docs yield none") {
    import spark.implicits._
    val df = Seq("a b c d e f", "a b").toDF("t")
      .select(Curation.ngramsOf(TextAnalysis.wsTokens(col("t")), 5).as("g"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c d e", "b c d e f"))
    assert(rows(1).isEmpty)
  }

  test("decontamination flags exactly the docs sharing a benchmark 5-gram") {
    val out = Curation.textDecontaminate.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // sanity: contaminated never exceeds candidate count, per source
    out.foreach { case (src, n, c) =>
      assert(c >= 0 && c <= n, s"$src: $c of $n")
    }
    // planted ground truth: a candidate that contains a benchmark doc's
    // exact text MUST flag (doc_id 0 is always in the benchmark holdout)
    import spark.implicits._
    val docs = graft.Tables(spark, sfDir).documents
    val benchText = docs.filter("doc_id = 0").select("text").head().getString(0)
    val tokens = benchText.trim.toLowerCase.split("\\s+")
    assume(tokens.length >= 5, "needs a benchmark doc with >= 5 tokens")
    val bench = docs.select(col("doc_id"), col("source"),
      TextAnalysis.wsTokens(lower(col("text"))).as("tk"))
      .filter(col("doc_id") % 97 === 0)
      .select(explode(Curation.ngramsOf(col("tk"), 5)).as("g")).distinct()
    val planted = tokens.take(5).mkString(" ")
    assert(bench.filter(col("g") === planted).count() == 1)
  }

  test("domain cap keeps at most K docs per source, the K smallest ids") {
    val out = Curation.textDomainCap.fn(spark, sfDir)
    val perSource = out.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(perSource.nonEmpty)
    perSource.foreach { case (s, n) => assert(n <= 50, s"$s kept $n") }
    // kept ids per source are exactly the smallest ones
    val docs = graft.Tables(spark, sfDir).documents
    val src = perSource.head._1
    val expect = docs.filter(col("source") === src).select("doc_id")
      .orderBy("doc_id").limit(50).collect().map(_.getLong(0)).toSeq
    val got = out.filter(col("source") === src).select("doc_id")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == expect)
  }

  test("mix resample: underrepresented sources keep everything, big ones downsample") {
    val out = Curation.textMixResample.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val total = out.map(_._2).sum
    val fairShare = total.toDouble / out.length
    out.foreach { case (s, n, kept) =>
      assert(kept <= n, s"$s kept $kept of $n")
      if (n <= fairShare) assert(kept == n,
        s"source $s below fair share must keep all ($kept of $n)")
    }
  }

  test("split assignment is exhaustive, deterministic and near the 90/5/5 target per stratum") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, sfDir).documents
    val out = Curation.textSplitAssign.fn(spark, sfDir).cache()
    // every document assigned exactly once
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // deterministic: a second invocation produces the identical mapping
    val again = Curation.textSplitAssign.fn(spark, sfDir)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // stable under corpus change: RECOMPUTE the assignment over a reduced
    // corpus (half the documents, materialized as its own table dir) and
    // compare against the full-corpus mapping — a corpus-dependent
    // assignment (rand(), global rank, proportional quota) would shift
    // splits here and fail; filtering the full output post-hoc would not
    // detect that
    val halfDir = java.nio.file.Files.createTempDirectory("graft-split-half")
    try {
      docs.filter(col("doc_id") % 2 === 0).write.mode("overwrite")
        .parquet(s"$halfDir/documents.parquet")
      val half = Curation.textSplitAssign.fn(spark, halfDir.toString)
      val expectHalf = out.filter(col("doc_id") % 2 === 0)
      assert(half.count() == expectHalf.count())
      assert(half.exceptAll(expectHalf).isEmpty && expectHalf.exceptAll(half).isEmpty,
        "split assignment must be independent of corpus membership")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(halfDir.toFile)
    }
    // proportions: global split near 90/5/5 (md5 uniformity; wide tolerance
    // at the 500-doc CI scale factor)
    val n = out.count().toDouble
    val byCounts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCounts("train") / n > 0.8 && byCounts("train") / n < 0.97, byCounts.toString)
    assert(byCounts.getOrElse("val", 0L) + byCounts.getOrElse("test", 0L) > 0, byCounts.toString)
  }

  test("semantic decontamination drops every planted benchmark copy, keeps the rest") {
    import org.apache.spark.sql.functions._
    val out = Curation.textSemanticDecontam.fn(spark, sfDir).cache()
    // all 20 planted copies (id >= 1M) are exact benchmark matches → gone
    assert(out.filter(col("vec_id") >= 1000000L).count() == 0,
      "planted contamination must be removed")
    // survivors are a subset of the non-benchmark corpus; the op can drop
    // naturally-similar vectors too, but never more than a sliver
    val corpusN = graft.Tables(spark, sfDir).embeddings
      .filter(col("vec_id") >= 20).count()
    val kept = out.count()
    assert(kept <= corpusN && kept >= corpusN * 9 / 10,
      s"kept $kept of $corpusN non-benchmark vectors")
  }
}
