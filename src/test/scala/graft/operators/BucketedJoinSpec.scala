package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkSpec {

  test("bucketed join plan has no exchange on the join keys") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    // fixed names: drop + clear any stale location so reruns don't leak
    for (n <- Seq("graft_spec_ta", "graft_spec_tb")) {
      spark.sql(s"DROP TABLE IF EXISTS $n")
      val loc = java.nio.file.Paths.get(java.net.URI.create(
        spark.conf.get("spark.sql.warehouse.dir")).getPath, n)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(java.nio.file.Files.walk(loc))(
          _.iterator.asScala.toSeq.reverse.foreach(java.nio.file.Files.delete))
      }
    }
    df.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("graft_spec_ta")
    df.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("graft_spec_tb")
    val a = spark.table("graft_spec_ta")
    val b = spark.table("graft_spec_tb").withColumnRenamed("v", "v2").withColumnRenamed("id", "id2")
    val joined = a.hint("merge").join(b, col("id") === col("id2"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == 1000)
  }

  test("q_bucketed_join reuses already-bucketed tables for the same source dir") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    Relational.qBucketedJoin.fn(spark, sfDir).count() // ensure tables built
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    val rebuilt =
      try {
        Relational.qBucketedJoin.fn(spark, sfDir).count()
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
        jobs.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    // a rebuild would add two multi-stage bucketed writes; a reused run is
    // just the join itself (a couple of jobs at most)
    assert(rebuilt <= 3, s"expected bucketed-table reuse, saw $rebuilt jobs")
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
