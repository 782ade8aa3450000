package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("custom TopKPerGroup matches the window row_number formulation") {
    val t = graft.Tables(spark, sfDir)
    val custom = TopK.qTopKPerGroup.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val window = t.orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(custom == window)
  }

  test("plan shape: partial reduction runs BEFORE the exchange") {
    val t = graft.Tables(spark, sfDir)
    val df = TopK.perGroup(t.orders, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 2)
    val plan = df.queryExecution.executedPlan.toString
    val partialIdx = plan.indexOf("PartialTopKPerGroup")
    val exchangeIdx = plan.indexOf("Exchange")
    val finalIdx = plan.indexOf("TopKPerGroup") // exec nodes print without the Exec suffix
    assert(partialIdx >= 0 && exchangeIdx >= 0 && finalIdx >= 0, s"missing nodes:\n$plan")
    // plan prints top-down: final < exchange < partial
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"unexpected ordering:\n$plan")
  }

  test("ties at the k boundary resolve by the unique tie-break column") {
    import spark.implicits._
    val df = Seq((1L, 10.0, 1L), (1L, 10.0, 2L), (1L, 10.0, 3L), (2L, 5.0, 4L))
      .toDF("g", "score", "id")
    val out = TopK.perGroup(df, Seq(col("g")), Seq(col("score").desc, col("id")), 2)
      .orderBy("g", "id").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(out == Seq((1L, 1L), (1L, 2L), (2L, 4L)))
  }
}
