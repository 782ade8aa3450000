package graft.streaming

import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset, Row}

/** E19 pins: the stream-static enrichment join's physical plan (the 100 TB
  * property — dim broadcast, stream side unshuffled per micro-batch) and
  * the twin's completeness across the micro-batch boundary.
  */
class EnrichPlanSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp = new Timestamp((1440 + minutes) * 60000L)

  test("E19: micro-batch plan broadcasts the dim; stream side has zero shuffles") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "alpha"), (2L, "beta")).toDF("k", "label")
    val input = MemoryStream[(Long, Long, Double)]
    val enriched = EventStreams.enrichWithDim(
      input.toDF().toDF("event_id", "k_ref", "value"), dim, col("k_ref") === col("k"))
    // the executed micro-batch plan comes from the query's lastExecution
    // (a foreachBatch frame would show only the materialized ExistingRDD —
    // the join runs inside the StreamExecution, not in the handed-off batch)
    val q = enriched.writeStream
      .format("memory").queryName("e19_plan").outputMode("append").start()
    val p =
      try {
        input.addData((10L, 1L, 0.5), (11L, 2L, 1.5), (12L, 3L, 2.5))
        q.processAllAvailable()
        q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
          .streamingQuery.lastExecution.executedPlan.toString
      } finally q.stop()
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      s"stream side must not shuffle for a dim enrichment:\n$p")
  }

  test("E19 generalized: a parquet dim broadcasts with NO explicit hint " +
      "(honest-broadcast proves batch sides inside streaming micro-batches)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // a parquet-backed dim: footer-provable, unlike the LocalRelation above
    val dim = Tables(spark, sfDir).nation
      .select(col("n_nationkey").as("k"), col("n_name").as("label"))
    val input = MemoryStream[(Long, Long, Double)]
    val enriched = input.toDF().toDF("event_id", "k_ref", "value")
      .join(dim, col("k_ref") === col("k")) // NO broadcast() hint
    val q = enriched.writeStream
      .format("memory").queryName("e19_nohint").outputMode("append").start()
    val p =
      try {
        input.addData((10L, 1L, 0.5), (11L, 2L, 1.5))
        q.processAllAvailable()
        q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
          .streamingQuery.lastExecution.executedPlan.toString
      } finally q.stop()
    assert(p.contains("BroadcastHashJoin"),
      s"footer-proven parquet dim must broadcast without a hint:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"stream side must not shuffle for a dim enrichment:\n$p")
  }

  test("E19 twin: two-batch replay equals the batch join (cross-batch dim completeness)") {
    val twin = StreamingQueries.streamEnrichTwin.fn(spark, sfDir).collect().toSet
    val t = Tables(spark, sfDir)
    val batch = t.events
      .join(t.customer, col("user_id") === col("c_custkey"))
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("c_name"), col("n_name"))
      .collect().toSet
    assert(twin == batch)
    assert(twin.nonEmpty)
  }
}
