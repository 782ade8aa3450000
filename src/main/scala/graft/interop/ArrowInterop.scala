package graft.interop

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, Row, SparkSession}

/** Arrow interchange utilities — the reference's arrow_utils.py surface
  * (/root/reference/utils/arrow_utils.py:8-85) re-expressed for the JVM:
  * instead of Spark↔pandas conversion, the JVM-native currency is Arrow IPC
  * record batches, the same zero-copy format every Arrow-speaking consumer
  * (pandas, DuckDB, Polars, Ray datasets, a feature store) ingests
  * directly.
  *
  * Scale notes: `toBatches` keeps the conversion DISTRIBUTED — each
  * partition serializes its own rows to Arrow batches (the exact executor
  * path PySpark's `toPandas` rides), so a 100 TB frame can be exported
  * partition-parallel to an Arrow-consuming sink without driver
  * involvement. Only `collectBatches` concentrates data on the driver, and
  * it exists for the reference's small-result handoff use case — bounded
  * results only, as `toPandas` is.
  */
object ArrowInterop {

  /** Rows-per-batch ceiling Spark applies when slicing partitions into
    * Arrow record batches (reference ARROW_BATCH_SIZE=10000, main.py:32).
    */
  def withBatchSize(spark: SparkSession, rows: Int): Unit =
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", rows.toString)

  /** Distributed export: one serialized Arrow IPC record batch per element
    * (a partition yields multiple batches when it exceeds the configured
    * maxRecordsPerBatch). The serialization runs ON THE EXECUTORS.
    */
  def toBatches(df: DataFrame): RDD[Array[Byte]] = GraftBridge.toArrowBatchRdd(df)

  /** Driver-side export for bounded results: the batches plus the schema
    * JSON needed to reconstruct the frame (or to build an Arrow
    * `Schema.fromJSON` on any consumer).
    */
  def collectBatches(df: DataFrame): (Seq[Array[Byte]], String) =
    (toBatches(df).collect().toSeq, df.schema.json)

  /** Re-import: Arrow IPC batches + schema JSON → DataFrame. Inverse of
    * [[collectBatches]]; together they round-trip a frame byte-stably.
    */
  def fromBatches(
      spark: SparkSession,
      batches: Seq[Array[Byte]],
      schemaJson: String): DataFrame =
    GraftBridge.fromArrowBatches(spark, batches.iterator, schemaJson)

  /** Partition-count hygiene before an Arrow export (reference
    * optimize_dataframe_for_arrow, arrow_utils.py:62-84): many tiny
    * partitions produce many tiny batches — coalesce (no shuffle) toward
    * ~`targetRowsPerPartition` when the partition count is excessive.
    */
  def optimizeForArrow(
      df: DataFrame,
      targetRowsPerPartition: Long = 10000L,
      maxPartitions: Int = 200): DataFrame = {
    val parts = df.rdd.getNumPartitions
    if (parts <= maxPartitions) df
    else {
      // plan-level row estimate, NOT an action: a count() here would scan
      // the whole frame once before the export scans it again (doubling IO
      // on exactly the large frames this helper exists for)
      val rowEst = df.queryExecution.optimizedPlan.stats.rowCount
      val optimal = rowEst
        .map(n => (n / BigInt(targetRowsPerPartition)).toLong)
        .map(n => math.min(maxPartitions.toLong, math.max(1L, n)).toInt)
        .getOrElse(maxPartitions)
      df.coalesce(optimal)
    }
  }

  /** Convenience round-trip through the driver (bounded frames): proves the
    * export is lossless and gives callers a one-line "detach from the
    * cluster" handoff.
    */
  def roundTrip(df: DataFrame): DataFrame = {
    val (batches, schemaJson) = collectBatches(df)
    fromBatches(df.sparkSession, batches, schemaJson)
  }
}
