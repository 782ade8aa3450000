package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` constructors needed to build a
  * DataFrame from a custom LogicalPlan and to extract Catalyst expressions
  * from public Columns — the two seams every plan-level Spark extension
  * needs (Spark 4 hides both behind `private[sql]`). Nothing else from the
  * internal API is touched.
  */
object GraftBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → catalyst Expression via the session's converter (eager: a
    * real catalyst tree, not a lazy ColumnNode wrapper — wrappers neither
    * resolve inside custom logical nodes nor serialize to executors).
    */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Catalyst Expression → Column — the reverse seam, for expressions that
    * carry bound driver-side state (e.g. a PQ codebook) and so cannot be
    * built through the string-routed `call_function` registry.
    */
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** A DataFrame's ANALYZED logical plan — the substitution target for
    * analyzer-rule relation resolution (graft.sql.GraftRelationRule).
    */
  def analyzed(df: Dataset[Row]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Pin a v1 `Sink.addBatch` frame as a fresh BATCH DataFrame: the frame
    * Spark hands a v1 sink rides the micro-batch's already-incrementalized
    * plan, which must not be re-analyzed under batch rules — wrap its
    * executed RDD in a non-streaming LogicalRDD first (the ForeachBatchSink
    * pattern) so downstream batch machinery (MERGE planning, writers) can
    * re-plan freely.
    */
  def sinkBatch(df: Dataset[Row]): Dataset[Row] = sinkBatch(df, df.sparkSession)

  /** [[sinkBatch]] pinned onto an explicit TARGET session. The frame a
    * v1 sink / foreachBatch hands over is bound to the micro-batch's
    * cloned session, on which Spark force-disables AQE for the stream's
    * own incremental planning — but the LANDING work (file-scoped MERGE,
    * CDC apply, append) is ordinary batch planning that wants AQE's
    * runtime broadcast recovery and partition coalescing. Re-basing the
    * pinned LogicalRDD onto the parent session (same SparkContext; the
    * RDD rides along) restores the engine's batch planning policy for
    * everything downstream of the pin.
    */
  def sinkBatch(df: Dataset[Row], target: SparkSession): Dataset[Row] = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val node = execution.LogicalRDD.fromDataset(
      cdf.queryExecution.toRdd, cdf, isStreaming = false)
    ofRows(target, node)
  }

  /** Stable per-session identity (collision-free, unlike identityHashCode) —
    * used to key session-scoped caches.
    */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID

  /** Number of plans pinned in the session's cache manager (test seam for
    * asserting operators release their parse/stage caches).
    */
  def numCachedPlans(spark: SparkSession): Int =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager
      .numCachedEntries

  /** Drain the async listener bus so SparkListener-based test assertions
    * (e.g. job counting) observe every event already emitted.
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Unload every cached streaming state-store provider on this JVM. A
    * completed streaming query leaves its HDFS-backed providers (and their
    * in-memory version maps — GBs for a large stateful replay) cached for
    * fast restart; a long-lived session running many distinct stateful
    * queries accumulates all of them. Callers must only invoke this with no
    * streaming query active (providers reload lazily, so a restarted query
    * still works — this trades restart speed for memory).
    */
  def unloadStateStores(): Unit =
    execution.streaming.state.StateStore.unloadAll()

  /** TEST seam for v1 streaming sources: strip the streaming tag from a
    * `Source.getBatch` frame so specs can execute it as a plain batch
    * (the analyzer otherwise demands writeStream.start()). Handles both
    * batch shapes the lake source emits — declarative scans
    * (LogicalRelation) and the RDD-wrapped initial snapshot (LogicalRDD).
    */
  def asBatch(df: Dataset[Row]): Dataset[Row] = {
    val plan = df.queryExecution.logical.transform {
      case lr: execution.datasources.LogicalRelation if lr.isStreaming =>
        lr.copy(isStreaming = false)
      case r: execution.LogicalRDD if r.isStreaming =>
        r.copy(isStreaming = false)(
          df.sparkSession.asInstanceOf[classic.SparkSession], None, None)
    }
    ofRows(df.sparkSession, plan)
  }

  /** Dataset → Arrow IPC record batches, one RDD element per batch (the
    * `private[sql]` seam PySpark's own toPandas path uses).
    */
  def toArrowBatchRdd(df: Dataset[Row]): org.apache.spark.rdd.RDD[Array[Byte]] =
    df.asInstanceOf[classic.Dataset[Row]].toArrowBatchRdd

  /** Arrow IPC record batches (+ schema JSON) → DataFrame — the reverse
    * seam (what createDataFrame-from-Arrow uses underneath).
    */
  def fromArrowBatches(
      spark: SparkSession,
      batches: Iterator[Array[Byte]],
      schemaJson: String): DataFrame =
    org.apache.spark.sql.execution.arrow.ArrowConverters.toDataFrame(
      batches, schemaJson, spark.asInstanceOf[classic.SparkSession])
}
