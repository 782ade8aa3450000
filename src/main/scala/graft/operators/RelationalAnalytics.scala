package graft.operators

import graft.{Q, Tables}
import graft.Num._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Third tranche of the analytical layer (SURVEY §2 C32-C38): the advanced
  * SQL surface a warehouse replacement needs — GROUPING SETS with
  * grouping_id, UNPIVOT/melt, RANGE window frames over event time,
  * forward-fill imputation, deterministic hash sampling, funnel
  * conversion, and retention cohorts.
  *
  * Scale notes: every operator stays declarative (one shuffle per
  * groupBy/window partition key); the deterministic sample is a
  * partition-local filter on a content hash — no global coordination, the
  * property that makes sampling reproducible across cluster sizes AND
  * engines.
  */
object RelationalAnalytics {

  private val D = "DECIMAL(12,2)"

  /** GROUPING SETS with an explicit grouping_id — finer control than
    * ROLLUP/CUBE (C5/C12): exactly the (status), (priority), and () sets.
    */
  val qGroupingSets: Q = Q(
    "q_grouping_sets",
    (s, dir) => {
      val t = Tables(s, dir)
      // fixed name + OrReplace: repeated invocations reuse one catalog slot
      val view = "graft_gs_src"
      t.orders.createOrReplaceTempView(view)
      s.sql(s"""SELECT o_orderstatus, o_orderpriority,
          CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS $D)) AS DOUBLE) AS total_price
        FROM $view
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
    },
    Some(s"""SELECT o_orderstatus, o_orderpriority,
      CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS $D)) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
  )

  /** UNPIVOT (melt): wide per-part numeric columns → long (part, metric,
    * value) — the reshape between storage-friendly wide tables and
    * analysis-friendly long ones.
    */
  val qUnpivot: Q = Q(
    "q_unpivot",
    (s, dir) => {
      val t = Tables(s, dir)
      t.part
        .select(col("p_partkey"), col("p_size").cast(DoubleType).as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("p_size"), col("p_retailprice")),
          "metric", "value")
        .orderBy("p_partkey", "metric")
    },
    Some("""SELECT p_partkey, metric, value FROM (
      SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL
      SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part) u
    ORDER BY p_partkey, metric""")
  )

  /** RANGE window frame over event time: each user's trailing-1-hour event
    * value sum — frames bounded by VALUE distance (micros), not row count.
    */
  val qWindowRange: Q = Q(
    "q_window_range",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-3600000000L, 0L)
      t.events
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
          m(col("value")).as("v"))
        .withColumn("trailing_1h_value", sum(col("v")).over(w).cast(DoubleType))
        .select("user_id", "event_id", "ts_us", "trailing_1h_value")
        .orderBy("user_id", "ts_us", "event_id")
    },
    Some(s"""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      CAST(SUM(CAST(value AS $D)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_1h_value
    FROM events ORDER BY user_id, ts_us, event_id""")
  )

  /** Forward-fill imputation: carry each user's last purchase value forward
    * across subsequent events (last_value IGNORE NULLS) — the standard
    * time-series gap-fill.
    */
  val qForwardFill: Q = Q(
    "q_forward_fill",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.events
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
          when(col("event_type") === "purchase", m(col("value"))).as("purchase_value"))
        .withColumn("filled_value",
          last(col("purchase_value"), ignoreNulls = true).over(w).cast(DoubleType))
        .select("user_id", "event_id", "ts_us", "filled_value")
        .orderBy("user_id", "ts_us", "event_id")
    },
    Some(s"""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      CAST(last_value(CASE WHEN event_type = 'purchase' THEN CAST(value AS $D) END IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS filled_value
    FROM events ORDER BY user_id, ts_us, event_id""")
  )

  /** Deterministic stratified sampling: keep rows whose md5(key) starts
    * with a fixed nibble — reproducible across engines, partitionings and
    * cluster sizes (NO rand()), with per-stratum accounting.
    */
  val qDetSample: Q = Q(
    "q_det_sample",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_sampled"),
          dsum(col("o_totalprice")).as("sampled_price"))
        .orderBy("o_orderstatus")
    },
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n_sampled,
      CAST(SUM(CAST(o_totalprice AS $D)) AS DOUBLE) AS sampled_price
    FROM orders
    WHERE substring(md5(o_orderkey::VARCHAR), 1, 1) = '0'
    GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  )

  /** Funnel conversion: per user, did signup → view → purchase happen in
    * strict event-time order? One aggregation pass (min event time per
    * stage), then ordered-stage counting.
    */
  val qFunnel: Q = Q(
    "q_funnel",
    (s, dir) => {
      val t = Tables(s, dir)
      val stages = t.events
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      stages.agg(
        count(col("t_signup")).as("n_signup"),
        sum(when(col("t_view") > col("t_signup"), 1L).otherwise(0L)).as("n_signup_view"),
        sum(when(col("t_view") > col("t_signup") && col("t_purchase") > col("t_view"), 1L)
          .otherwise(0L)).as("n_signup_view_purchase"))
    },
    Some("""WITH stages AS (
      SELECT user_id,
        MIN(CASE WHEN event_type = 'signup' THEN epoch_ns(ts) END) AS t_signup,
        MIN(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_view,
        MIN(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS t_purchase
      FROM events GROUP BY user_id)
    SELECT COUNT(t_signup) AS n_signup,
      CAST(SUM(CASE WHEN t_view > t_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_view,
      CAST(SUM(CASE WHEN t_view > t_signup AND t_purchase > t_view THEN 1 ELSE 0 END) AS BIGINT)
        AS n_signup_view_purchase
    FROM stages""")
  )

  /** Retention cohorts: users grouped by first-activity day; counts of
    * distinct users active k days later — integer-exact day arithmetic on
    * the micros epoch.
    */
  val qRetention: Q = Q(
    "q_retention",
    (s, dir) => {
      val t = Tables(s, dir)
      val days = t.events
        .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
        .distinct()
      val cohorts = days.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      days.join(cohorts, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },
    Some("""WITH days AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
    cohorts AS (SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id)
    SELECT cohort_day, day - cohort_day AS day_offset, COUNT(DISTINCT days.user_id) AS n_users
    FROM days JOIN cohorts USING (user_id)
    GROUP BY cohort_day, day_offset ORDER BY cohort_day, day_offset""")
  )

  /** Exact z-score outlier detection per group, with no stddev() call:
    * z^2 > 9  ⟺  (n*x - S)^2 > 9*(n*S2 - S^2), where S/S2 are the exact
    * decimal sum and sum-of-squares. The aggregates are reduction-order-
    * independent (decimal), and the final comparison runs in IEEE doubles
    * computed identically on both engines — no Welford-vs-naive variance
    * discrepancy, which is what makes textbook stddev un-oracle-able.
    */
  val qOutliers: Q = Q(
    "q_outliers",
    (s, dir) => {
      val t = Tables(s, dir)
      val x = m(col("o_totalprice"))
      // Two-pass, no window: o_orderstatus has ~3 values, so a window
      // partitioned on it funnels the whole fact through 3 tasks at scale.
      // Instead the moments (n, sum, sum-of-squares) partial-aggregate to a
      // 3-row frame that broadcast-joins back — the fact is scanned twice
      // but never single-task-sorted, and both scans are full-speed
      // columnar parquet reads.
      val stats = t.orders.groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          sum(x).cast(DoubleType).as("sv"),
          sum(x * x).cast(DoubleType).as("s2"))
      t.orders
        .join(broadcast(stats), "o_orderstatus")
        .withColumn("lhs",
          (col("n") * col("o_totalprice") - col("sv")) *
            (col("n") * col("o_totalprice") - col("sv")))
        .withColumn("rhs", lit(9.0) * (col("n") * col("s2") - col("sv") * col("sv")))
        .filter(col("lhs") > col("rhs"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    },
    Some(s"""SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
        COUNT(*) OVER w AS n,
        CAST(SUM(CAST(o_totalprice AS $D)) OVER w AS DOUBLE) AS sv,
        CAST(SUM(CAST(o_totalprice AS $D) * CAST(o_totalprice AS $D)) OVER w AS DOUBLE) AS s2
      FROM orders WINDOW w AS (PARTITION BY o_orderstatus)) t
    WHERE (n * o_totalprice - sv) * (n * o_totalprice - sv) > 9.0 * (n * s2 - sv * sv)
    ORDER BY o_orderkey""")
  )

  /** Distribution window functions: percent_rank, cume_dist, ntile —
    * rank-derived ratios of exact integers (IEEE-identical across
    * engines); ntile gets a unique tie-break so bucket assignment is
    * deterministic.
    */
  val qWindowDistribution: Q = Q(
    "q_window_distribution",
    (s, dir) => {
      val t = Tables(s, dir)
      // Distributed global rank — the scalable replacement for
      // Window.partitionBy(3-value key): range-partition the fact on the
      // FULL sort key so partition i's rows all sort before partition
      // i+1's, rank locally within (partition, status), then add the count
      // of same-status rows in earlier partitions (a tiny per-partition
      // count frame, broadcast back). percent_rank / cume_dist / ntile are
      // then pure expressions of (rn, n): the ordering key is unique
      // (orderkey tie-break), so rank == row_number and there are no
      // tie-plateaus to special-case. Every heavy stage is bounded by the
      // range-partition size, never by group size.
      val orders = t.orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
      val nParts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val parted = orders
        .repartitionByRange(nParts,
          col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
        .withColumn("pid", spark_partition_id())
      val wLocal = Window.partitionBy("pid", "o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      // The ranked frame MUST be materialized once (lazy localCheckpoint):
      // range-partition bounds come from sampling seeded per RDD
      // instantiation, and spark_partition_id() blocks exchange reuse — so
      // without a checkpoint the offsets aggregate and the final join would
      // each recompute the shuffle and could see DIFFERENT partition
      // boundaries, silently corrupting the global ranks. The checkpoint
      // also halves the IO: one scan + one range exchange instead of two.
      val local = parted
        .withColumn("lrn", row_number().over(wLocal))
        .localCheckpoint(eager = false)
      // per-(partition, status) row counts -> exclusive running offsets;
      // this frame has at most nParts x |statuses| rows
      val wOff = Window.partitionBy("o_orderstatus").orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = local.groupBy("pid", "o_orderstatus")
        .agg(count(lit(1)).as("c"))
        .select(col("pid"), col("o_orderstatus"),
          coalesce(sum("c").over(wOff), lit(0L)).as("off"),
          sum("c").over(Window.partitionBy("o_orderstatus")).as("n"))
      local
        .join(broadcast(offsets), Seq("pid", "o_orderstatus"))
        .withColumn("rn", col("lrn") + col("off"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("n") === 1, lit(0.0))
            .otherwise((col("rn") - 1).cast(DoubleType) / (col("n") - 1))
            .as("pct_rank"),
          (col("rn").cast(DoubleType) / col("n")).as("cume"),
          // ntile(4) from first principles: the first n%4 tiles hold
          // ceil(n/4) rows, the rest floor(n/4) — integer arithmetic only
          expr("""CAST(CASE WHEN rn <= (n % 4) * (n DIV 4 + 1)
                 THEN (rn - 1) DIV (n DIV 4 + 1) + 1
                 ELSE (n % 4) + (rn - (n % 4) * (n DIV 4 + 1) - 1) DIV (n DIV 4) + 1
                 END AS INT)""").as("quartile"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus,
      percent_rank() OVER w AS pct_rank,
      cume_dist() OVER w AS cume,
      ntile(4) OVER w AS quartile
    FROM orders WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey""")
  )

  /** Exact per-group median WITHOUT percentile interpolation drift: pick
    * the middle row(s) by row_number and average the (one or two) exact
    * decimal values — reproducible on any engine, unlike quantile_cont
    * implementations that disagree on the interpolation formula.
    */
  val qExactMedian: Q = Q(
    "q_exact_median",
    (s, dir) => {
      val t = Tables(s, dir)
      // Exact median by two-pass count/offset selection — no window over
      // the 3-value status key. Pass 1 builds a fixed-width price histogram
      // per status (tiny: statuses x 1024 buckets) and running bucket
      // offsets locate which bucket holds each middle rank. Pass 2 ranks
      // rows ONLY inside those target buckets (window keyed by
      // (status, bucket) — task size is one bucket, ~n/1024 rows, not one
      // status's full n). Bucketing by price is rank-consistent: floor of a
      // monotone map preserves the (price, orderkey) order across buckets.
      val NB = 1024
      val orders = t.orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
      val spans = orders.groupBy("o_orderstatus").agg(
        count(lit(1)).as("n"),
        min("o_totalprice").as("lo"),
        max("o_totalprice").as("hi"))
      val bucketed = orders
        .join(broadcast(spans), "o_orderstatus")
        .withColumn("bkt",
          when(col("hi") === col("lo"), lit(0))
            .otherwise(least(lit(NB - 1),
              floor((col("o_totalprice") - col("lo")) /
                ((col("hi") - col("lo")) / NB)).cast("int"))))
      val wCum = Window.partitionBy("o_orderstatus").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val targets = bucketed.groupBy("o_orderstatus", "bkt")
        .agg(count(lit(1)).as("c"))
        .withColumn("off", coalesce(sum("c").over(wCum), lit(0L)))
        .join(broadcast(spans.select(col("o_orderstatus"), col("n"))), "o_orderstatus")
        .withColumn("k1", expr("(n + 1) DIV 2"))
        .withColumn("k2", expr("n DIV 2 + 1"))
        .filter(
          (col("k1") > col("off") && col("k1") <= col("off") + col("c")) ||
            (col("k2") > col("off") && col("k2") <= col("off") + col("c")))
        .select("o_orderstatus", "bkt", "off", "k1", "k2")
      val wBkt = Window.partitionBy("o_orderstatus", "bkt")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      bucketed
        .join(broadcast(targets), Seq("o_orderstatus", "bkt"))
        .withColumn("rn", row_number().over(wBkt) + col("off"))
        .filter(col("rn") === col("k1") || col("rn") === col("k2"))
        .groupBy("o_orderstatus")
        .agg((sum(m(col("o_totalprice"))).cast(DoubleType) / count(lit(1)))
          .as("median_price"))
        .orderBy("o_orderstatus")
    },
    Some(s"""SELECT o_orderstatus,
      CAST(SUM(CAST(o_totalprice AS $D)) AS DOUBLE) / COUNT(*) AS median_price
    FROM (
      SELECT o_orderstatus, o_totalprice,
        row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS rn,
        COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders) t
    WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
    GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  )

  /** FULL OUTER join with null-side accounting: segment-level customer /
    * order coverage where either side can be absent — the reconciliation
    * join shape (which rows exist only-left / only-right / both).
    */
  val qFullOuter: Q = Q(
    "q_full_outer",
    (s, dir) => {
      val t = Tables(s, dir)
      val perCust = t.orders.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      t.customer
        .join(perCust, col("c_custkey") === col("o_custkey"), "full_outer")
        .groupBy(coalesce(col("c_mktsegment"), lit("<no-customer>")).as("segment"))
        .agg(
          count(col("c_custkey")).as("n_customers"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_without_orders"),
          sum(coalesce(col("n_orders"), lit(0L))).as("n_orders"))
        .orderBy("segment")
    },
    Some("""SELECT COALESCE(c_mktsegment, '<no-customer>') AS segment,
      COUNT(c_custkey) AS n_customers,
      CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_without_orders,
      CAST(SUM(COALESCE(n_orders, 0)) AS BIGINT) AS n_orders
    FROM customer
    FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
      ON c_custkey = o_custkey
    GROUP BY 1 ORDER BY 1""")
  )

  /** Deterministic argmax per group: the order key holding each status's
    * maximum price, via max(struct(price, key)) — lexicographic struct
    * ordering makes the tie-break explicit instead of max_by's
    * pick-any-on-ties.
    */
  val qArgmax: Q = Q(
    "q_argmax",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .groupBy("o_orderstatus")
        .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("mx"))
        .select(col("o_orderstatus"), col("mx.o_orderkey").as("top_orderkey"),
          col("mx.o_totalprice").as("top_price"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, o_orderkey AS top_orderkey, o_totalprice AS top_price
    FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_orderstatus
              ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
          FROM orders) t
    WHERE rn = 1 ORDER BY o_orderstatus""")
  )

  /** Time-series RESAMPLE to a regular hourly grid with LINEAR
    * interpolation of gaps — the time-series half of imputation (C35's
    * forward-fill carries the last value; resampling reconstructs the
    * trend between known points, the shape feature pipelines need for
    * regularly-spaced training windows).
    *
    * Scale design: raw events collapse to per-(type, hour) totals FIRST
    * (partial-agg groupBy), and every window below runs over the
    * RESAMPLED grid — one row per hour per type, bounded by the time
    * span, never by event volume. The interpolation itself is exact
    * integer hour arithmetic and IEEE double ops mirrored
    * operation-for-operation in the oracle.
    */
  val qResample: Q = Q(
    "q_resample",
    (s, dir) => {
      val t = Tables(s, dir)
      val hourly = t.events
        .groupBy(expr("(unix_micros(ts) DIV 3600000000) * 3600").as("hour_s"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total"))
      val grid = hourly.groupBy("event_type")
        .agg(min(col("hour_s")).as("lo"), max(col("hour_s")).as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"), lit(3600L))).as("hour_s"))
      val w = Window.partitionBy("event_type").orderBy("hour_s")
      val wPrev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      def known(c: String) = when(col("total").isNotNull, col(c))
      grid.join(hourly, Seq("event_type", "hour_s"), "left")
        .withColumn("prev_t", last(known("hour_s"), ignoreNulls = true).over(wPrev))
        .withColumn("prev_v", last(known("total"), ignoreNulls = true).over(wPrev))
        .withColumn("next_t", first(known("hour_s"), ignoreNulls = true).over(wNext))
        .withColumn("next_v", first(known("total"), ignoreNulls = true).over(wNext))
        .select(col("event_type"), col("hour_s"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("total"),
            col("prev_v") + (col("next_v") - col("prev_v")) *
              (col("hour_s") - col("prev_t")).cast(DoubleType) /
              (col("next_t") - col("prev_t")).cast(DoubleType)).as("total_filled"),
          col("total").isNull.as("interpolated"))
        .orderBy("event_type", "hour_s")
    },
    Some(s"""WITH hourly AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s, event_type,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS $D)) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2),
    grid AS (
      SELECT event_type, unnest(range(lo, hi + 3600, 3600)) AS hour_s
      FROM (SELECT event_type, MIN(hour_s) AS lo, MAX(hour_s) AS hi
            FROM hourly GROUP BY event_type)),
    joined AS (
      SELECT g.event_type, g.hour_s, h.n_events, h.total,
        last_value(CASE WHEN h.total IS NOT NULL THEN g.hour_s END IGNORE NULLS)
          OVER (PARTITION BY g.event_type ORDER BY g.hour_s
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
        last_value(CASE WHEN h.total IS NOT NULL THEN h.total END IGNORE NULLS)
          OVER (PARTITION BY g.event_type ORDER BY g.hour_s
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        first_value(CASE WHEN h.total IS NOT NULL THEN g.hour_s END IGNORE NULLS)
          OVER (PARTITION BY g.event_type ORDER BY g.hour_s
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t,
        first_value(CASE WHEN h.total IS NOT NULL THEN h.total END IGNORE NULLS)
          OVER (PARTITION BY g.event_type ORDER BY g.hour_s
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v
      FROM grid g LEFT JOIN hourly h
        ON g.event_type = h.event_type AND g.hour_s = h.hour_s)
    SELECT event_type, hour_s,
      COALESCE(n_events, 0) AS n_events,
      COALESCE(total,
        prev_v + (next_v - prev_v) * CAST(hour_s - prev_t AS DOUBLE)
          / CAST(next_t - prev_t AS DOUBLE)) AS total_filled,
      total IS NULL AS interpolated
    FROM joined ORDER BY event_type, hour_s""")
  )

  val all: Seq[Q] = Seq(qGroupingSets, qUnpivot, qWindowRange, qForwardFill,
    qDetSample, qFunnel, qRetention, qOutliers, qWindowDistribution, qExactMedian,
    qFullOuter, qArgmax, qResample)
}
