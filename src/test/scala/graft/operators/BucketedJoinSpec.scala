package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkSpec {

  test("bucketed join plan has no exchange on the join keys") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    df.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable(s"ta_$sfx")
    df.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable(s"tb_$sfx")
    val a = spark.table(s"ta_$sfx")
    val b = spark.table(s"tb_$sfx").withColumnRenamed("v", "v2").withColumnRenamed("id", "id2")
    val joined = a.hint("merge").join(b, col("id") === col("id2"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == 1000)
  }

  test("q_bucketed_join matches the plain shuffled join") {
    val bucketed = Relational.qBucketedJoin.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val t = graft.Tables(spark, sfDir)
    val plain = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(graft.Num.discPrice).cast("double").as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(bucketed.toSeq == plain.toSeq)
  }
}
