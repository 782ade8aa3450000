package graft.interop

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArrowSpec extends SparkSpec {

  test("Arrow round-trip is lossless across core types") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", 1.5, Seq(1, 2, 3), java.sql.Date.valueOf("2024-01-01")),
      (2L, "β-unicode", -0.25, Seq.empty[Int], java.sql.Date.valueOf("1999-12-31"))
    ).toDF("id", "name", "score", "xs", "d")
    val back = ArrowInterop.roundTrip(df)
    assert(back.schema == df.schema)
    assert(back.collect().toSeq == df.collect().toSeq)
  }

  test("Arrow export is byte-stable and honors the batch-size ceiling") {
    import spark.implicits._
    try {
      ArrowInterop.withBatchSize(spark, 100)
      val df = spark.range(0, 1000, 1, 2).selectExpr("id", "CAST(id AS STRING) AS s")
      val (b1, schemaJson) = ArrowInterop.collectBatches(df)
      val (b2, _) = ArrowInterop.collectBatches(df)
      assert(b1.size == b2.size)
      assert(b1.zip(b2).forall { case (x, y) => java.util.Arrays.equals(x, y) },
        "export not byte-stable across invocations")
      // 1000 rows over 2 partitions with a 100-row ceiling → ≥10 batches
      assert(b1.size >= 10, s"batch ceiling ignored: ${b1.size} batches")
      val back = ArrowInterop.fromBatches(spark, b1, schemaJson)
      assert(back.count() == 1000)
      assert(back.agg(sum("id")).head().getLong(0) == 499500L)
    } finally ArrowInterop.withBatchSize(spark, 10000)
  }

  test("optimizeForArrow coalesces excessive partition counts without a shuffle") {
    val df = spark.range(0, 2000, 1, 400).toDF("id")
    val opt = ArrowInterop.optimizeForArrow(df, targetRowsPerPartition = 100L)
    assert(opt.rdd.getNumPartitions <= 200)
    assert(opt.rdd.getNumPartitions == 20, s"2000/100 → 20, got ${opt.rdd.getNumPartitions}")
    // coalesce, not repartition: no exchange in the plan
    assert(!opt.queryExecution.executedPlan.toString.contains("Exchange"))
    // small partition counts pass through untouched
    val small = spark.range(10).toDF("id")
    assert(ArrowInterop.optimizeForArrow(small) eq small)
  }
}
