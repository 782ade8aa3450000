package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("language ID identifies real-language samples") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy with the sun for a while"),
      ("de", "der hund und die katze sind nicht mit dem ball auf der wiese"),
      ("es", "el perro y la gata son los animales que viven en una casa"),
      ("fr", "le chien et le chat sont les animaux que nous avons dans une maison"),
      ("zh", "这是一个中文句子用来测试语言识别功能是否正常工作")
    ).toDF("expected", "text")
    val (pred, _) = TextAnalysis.langIdColumns(col("text"))
    val wrong = samples.withColumn("pred", pred)
      .filter(col("pred") =!= col("expected")).collect()
    assert(wrong.isEmpty, s"misclassified: ${wrong.mkString(",")}")
  }

  test("token counts: whitespace vs bpe-ish lexer") {
    import spark.implicits._
    val df = Seq("Hello, world! 42 tokens?").toDF("text")
    val row = df.select(
      size(TextAnalysis.wsTokens(col("text"))).as("ws"),
      TextAnalysis.bpeishCount(col("text")).as("bpe")).collect()(0)
    assert(row.getInt(0) == 4)
    // Hello , world ! 42 tokens ? → 7
    assert(row.getInt(1) == 7)
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    import spark.implicits._
    val df = Seq(
      ("a", "Hello   World"),
      ("b", "hello world"),
      ("c", "hello worlds")
    ).toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fps("a") == fps("b"))
    assert(fps("a") != fps("c"))
  }

  test("quality columns are in-range over the corpus") {
    val df = TextAnalysis.textQuality.fn(spark, sfDir)
    for (c <- Seq("alpha_ratio", "punct_ratio", "stopword_ratio", "distinct_token_ratio")) {
      assert(df.filter(col(c) < 0 || col(c) > 1).count() == 0, s"$c out of [0,1]")
    }
    assert(df.filter(col("n_tokens") <= 0).count() == 0)
  }

  test("compression ratio separates repetitive from diverse text and is deterministic") {
    import spark.implicits._
    val rep = "spam spam spam spam spam spam spam spam spam spam " * 20
    val div = (1 to 200).map(i => s"w${i * 7919 % 9973}x${i * 104729 % 999}").mkString(" ")
    val df = Seq(("rep", rep), ("div", div)).toDF("id", "text")
      .select(col("id"),
        call_function("graft_deflate_len", col("text")).as("dl"),
        octet_length(col("text")).as("bl"))
    val m = df.collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    val repRatio = m("rep")._1.toDouble / m("rep")._2
    val divRatio = m("div")._1.toDouble / m("div")._2
    assert(repRatio < 0.1, s"repetitive text should compress hard: $repRatio")
    assert(divRatio > repRatio * 3, s"diverse $divRatio vs repetitive $repRatio")
    // deterministic across invocations
    val again = Seq(("rep", rep)).toDF("id", "text")
      .select(call_function("graft_deflate_len", col("text"))).head().getInt(0)
    assert(again == m("rep")._1)
    // corpus-wide sanity: every ratio positive and <= ~1 (+ small header slack)
    val corpus = TextAnalysis.textCompression.fn(spark, sfDir)
    assert(corpus.filter(col("compression_ratio") <= 0 ||
      col("compression_ratio") > 1.5).count() == 0)
  }

  test("text_tfidf builds lazily: construction costs no more jobs than a bare scan") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    def jobsDuring(body: => Unit): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new SparkListener {
        override def onJobStart(s: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      }
      spark.sparkContext.addSparkListener(listener)
      try { body; org.apache.spark.sql.GraftBridge.drainListenerBus(spark) }
      finally spark.sparkContext.removeSparkListener(listener)
      jobs.get()
    }
    // constructing ANY parquet reader may launch schema-inference work;
    // that is the permitted baseline...
    val baseline = jobsDuring { graft.Tables(spark, sfDir).documents; () }
    // ...and building the full tf-idf query must not exceed it (the old
    // implementation ran an eager docs.count() — one extra multi-stage job)
    var q: org.apache.spark.sql.DataFrame = null
    val built = jobsDuring { q = TextAnalysis.textTfidf.fn(spark, sfDir) }
    assert(built <= baseline,
      s"query construction launched $built job(s) vs scan baseline $baseline; " +
        "the IDF denominator must be a lazy scalar aggregate, not an eager count")
    assert(q.limit(1).count() == 1) // plan still executes
  }
}
