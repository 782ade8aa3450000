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
}
