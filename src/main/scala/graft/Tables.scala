package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish star schema (see TESTDATA.md).
  * Plain declarative parquet scans: Catalyst pushes filters/projections from
  * downstream operators into these reads (verified via PushedFilters in
  * explain output).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** Events with ONE canonical time encoding: `ts` is always a native
    * TimestampType (microsecond precision). The driver's testdata has
    * shipped `ts` both as nanos-since-epoch int64 (rounds 1-7, surfaced as
    * LongType via nanosAsLong) and as parquet timestamp[us] with
    * isAdjustedToUTC=false (round 8+, surfaced as TIMESTAMP_NTZ); every
    * consumer reads through this accessor, which converts either legacy
    * encoding on load. The NTZ→timestamp cast is the identity on the
    * stored micros because the session time zone is pinned to UTC
    * (GraftSession). Operators that want integer arithmetic derive
    * `unix_micros(ts)` — the exact value DuckDB's `epoch_us(ts)` computes
    * on the same file, so oracle comparisons stay bit-identical.
    */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType => // legacy nanos-as-int64: truncate to micros once
        Tables.assertPlausibleEpochNanos(raw)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => // wall-clock micros == UTC instant micros
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        sys.error(s"events.ts: unsupported encoding $other (expected TIMESTAMP, TIMESTAMP_NTZ or BIGINT nanos)")
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** Guards the int64-nanos branch against a silent unit flip: a future
    * corpus shipping micros-as-int64 would still surface as LongType, pass
    * the schema contract, and be mis-scaled 1000x by `ts DIV 1000`. A
    * single min/max aggregate (one cheap scan over the int64 column,
    * parquet footer stats usually answer it) pins the decoded instants to a
    * plausible year range; micros-as-int64 decodes to ~1970 and fails
    * loudly instead of canonicalizing wrong.
    */
  private[graft] def assertPlausibleEpochNanos(raw: DataFrame): Unit = {
    val bounds = raw.selectExpr("min(ts) AS lo", "max(ts) AS hi").head()
    if (!bounds.isNullAt(0)) {
      val (lo, hi)   = (bounds.getLong(0), bounds.getLong(1))
      // 2000-01-01 .. 2100-01-01 as epoch nanos
      val minNanos = 946684800L * 1000000000L
      val maxNanos = 4102444800L * 1000000000L
      require(
        lo >= minNanos && hi < maxNanos,
        s"events.ts int64 range [$lo, $hi] is outside plausible epoch-NANOS bounds " +
          s"[$minNanos, $maxNanos) — is the corpus actually micros- or millis-as-int64? " +
          "Refusing to canonicalize with a possibly wrong unit.")
    }
  }
}
