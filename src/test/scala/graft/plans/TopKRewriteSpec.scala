package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKRewriteSpec extends SparkSpec {

  private def windowTopK(dropRank: Boolean): DataFrame = {
    val t = graft.Tables(spark, sfDir)
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val ranked = t.orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    if (dropRank) ranked.select("o_custkey", "o_orderkey", "o_totalprice")
    else ranked.select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  private def withRewrite[A](f: => A): A = {
    spark.conf.set("spark.graft.topkRewrite", "true")
    try f finally spark.conf.set("spark.graft.topkRewrite", "false")
  }

  test("rule rewrites window top-k into TopKPerGroup when rank is dropped") {
    withRewrite {
      val df = windowTopK(dropRank = true)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("TopKPerGroup"), plan)
      assert(!plan.contains("Window"), plan)
    }
  }

  test("rewritten plan returns the same rows as the window plan") {
    val expected = windowTopK(dropRank = true)
      .orderBy("o_custkey", "o_orderkey").collect().toSeq
    val actual = withRewrite {
      windowTopK(dropRank = true).orderBy("o_custkey", "o_orderkey").collect().toSeq
    }
    assert(actual == expected)
  }

  test("rule does NOT fire when the rank column is still referenced") {
    withRewrite {
      val plan = windowTopK(dropRank = false).queryExecution.optimizedPlan.toString
      assert(plan.contains("Window") && !plan.contains("TopKPerGroup"), plan)
    }
  }

  test("rule is off by default") {
    val plan = windowTopK(dropRank = true).queryExecution.optimizedPlan.toString
    assert(plan.contains("Window") && !plan.contains("TopKPerGroup"), plan)
  }
}
