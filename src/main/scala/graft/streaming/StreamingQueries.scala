package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Driver-checked STREAMING query (SURVEY §2 E7 twin): the batch-vs-stream
  * equivalence itself, under the DuckDB oracle.
  *
  * The corpus (documents + planted mutants — the exact input of
  * `dedup_minhash`) is replayed through the E7 streaming near-dup operator
  * as a two-micro-batch stream, and the emitted candidate pairs are
  * returned as an ordinary frame. The oracle is the SAME generated SQL
  * that checks the batch pipeline — so a hash match proves the streaming
  * path (stateful LSH buckets, cross-batch memory, per-arrival scoring)
  * reproduces the batch MinHash pairs bit-for-bit, est_jaccard included.
  *
  * Replay order is doc_id-ascending (ties impossible), which makes the
  * stream's first-k bucket occupancy equal the batch path's min-k bucket
  * cap — the two caps provably coincide when arrival order is id order.
  */
object StreamingQueries {

  val streamNeardupTwin: Q = Q(
    "stream_neardup_twin",
    (s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      // the replay source: bounded, collected once (the stream side must be
      // fed from the driver; pair output is bounded by the batch twin's)
      val corpus = graft.operators.Dedup
        .withPlantedDups(Tables(s, dir).documents)
        .select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val input = MemoryStream[EventStreams.DocIn]
      val sink = s"stream_neardup_twin_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val query = EventStreams.nearDupCandidates(input.toDS(), threshold = 0.5)
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        // two micro-batches: cross-batch pairs exercise the bucket state.
        // Timestamps must sit ABOVE epoch 0 — Spark's global watermark
        // starts at 0 and the stateful operator drops rows at/below it as
        // late, so an epoch-0 replay would silently discard every doc.
        val base = 1700000000000L
        val (first, second) = corpus.splitAt(corpus.length / 2)
        input.addData(first.map { case (id, t) =>
          EventStreams.DocIn(id, new java.sql.Timestamp(base), t) }.toIndexedSeq)
        query.processAllAvailable()
        input.addData(second.map { case (id, t) =>
          EventStreams.DocIn(id, new java.sql.Timestamp(base + 60000L), t) }.toIndexedSeq)
        query.processAllAvailable()
        // a pair colliding in several bands emits once per band: distinct
        s.table(sink)
          .select(col("a"), col("b"), col("est_jaccard"))
          .distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toIndexedSeq
          .toDF("a", "b", "est_jaccard")
          .orderBy("a", "b")
      } finally {
        query.stop()
        s.catalog.dropTempView(sink)
        ()
      }
    },
    // the batch pipeline's generated oracle, verbatim — stream == batch
    Some(graft.Q.oracleResource("dedup_minhash"))
  )

  /** Second stream-vs-batch equivalence, this time for the WINDOWED
    * AGGREGATION operator (E1): the whole events table is replayed
    * through `hourlyAggregates` as a two-micro-batch stream in complete
    * output mode, and the final aggregation state must hash-match the
    * same per-hour totals DuckDB computes over the table at rest. This
    * pins the streaming agg's window assignment, decimal sum and
    * cross-batch state merge — count and sum partials from batch 1 must
    * combine exactly with batch 2's — under the external oracle, not
    * just a Spark-vs-Spark spec. (countDistinct is not available to
    * streaming aggs, so the twin checks the count/sum columns.)
    *
    * The driver-fed replay collects the bounded events table once — the
    * cost of making a stream from data at rest, not a pattern for
    * production sources.
    */
  val streamBucketsTwin: Q = Q(
    "stream_buckets_twin",
    (s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      // events.ts is a nanos long (TESTDATA): micros → Timestamp keeps
      // hour-bucket assignment exact (truncation cannot cross an hour)
      val rows = Tables(s, dir).events
        .select(col("ts"), col("user_id"), col("event_type"), col("value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
        .sortBy(_._1)
      val input = MemoryStream[EventStreams.Event]
      val sink = s"stream_buckets_twin_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val query = EventStreams.hourlyAggregates(input.toDF())
        .writeStream.format("memory").queryName(sink).outputMode("complete").start()
      try {
        val (first, second) = rows.splitAt(rows.length / 2)
        def toEvents(part: Array[(Long, Long, String, Double)], off: Long) =
          part.zipWithIndex.map { case ((nanos, uid, et, v), i) =>
            val ts = new java.sql.Timestamp(nanos / 1000000L)
            ts.setNanos(((nanos % 1000000000L) / 1000L * 1000L).toInt)
            EventStreams.Event(off + i, ts, uid, et, v)
          }.toIndexedSeq
        input.addData(toEvents(first, 0L))
        query.processAllAvailable()
        input.addData(toEvents(second, first.length.toLong))
        query.processAllAvailable()
        val out = s.table(sink)
          .select(col("window.start").cast("long").as("bucket_s"),
            col("event_type"), col("n_events"), col("total_value"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
          .toIndexedSeq
        out.toDF("bucket_s", "event_type", "n_events", "total_value")
          .orderBy("bucket_s", "event_type")
      } finally {
        query.stop()
        s.catalog.dropTempView(sink)
        ()
      }
    },
    Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_s,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  /** Third stream-vs-batch equivalence: the STATEFUL SESSIONIZER (E2)
    * under the DuckDB oracle. The whole events table is replayed through
    * `sessionize` (flatMapGroupsWithState, event-time timeout) in
    * timestamp order, and the emitted sessions must hash-match the
    * gaps-and-islands SQL the oracle computes over the table at rest —
    * the same boundary arithmetic as q_sessionize (micros precision,
    * 30-minute gap), now proven for the cross-batch state path: sessions
    * spanning the replay split, session-id continuity through tombstones,
    * and timeout-driven emission.
    *
    * The final open session per user only leaves the operator when the
    * WATERMARK passes its gap horizon, which in a replay means feeding
    * two sentinel batches whose far-future timestamps push the watermark
    * past every real event (the first sentinel batch advances the
    * watermark; timeouts FIRE while processing the second). The sentinel
    * user (-1) is excluded from the result.
    */
  val streamSessionsTwin: Q = Q(
    "stream_sessions_twin",
    (s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      // replay in the oracle's per-user order key (micros, event_id):
      // batches split a globally sorted feed, so no event arrives below
      // the watermark and cross-batch per-user order is preserved
      val rows = Tables(s, dir).events
        .select(col("ts"), col("user_id"), col("event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1 / 1000L, t._3))
      def toEvent(nanos: Long, uid: Long, eid: Long): EventStreams.Event = {
        // micros-truncated timestamp: the boundary precision both engines use
        val ts = new java.sql.Timestamp(nanos / 1000000L)
        ts.setNanos(((nanos % 1000000000L) / 1000L * 1000L).toInt)
        EventStreams.Event(eid, ts, uid, "replay", 0.0)
      }
      val input = MemoryStream[EventStreams.Event]
      val sink = s"stream_sessions_twin_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val query = EventStreams.sessionize(input.toDS())
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        val (first, second) = rows.splitAt(rows.length / 2)
        input.addData(first.map { case (n, u, e) => toEvent(n, u, e) }.toIndexedSeq)
        query.processAllAvailable()
        input.addData(second.map { case (n, u, e) => toEvent(n, u, e) }.toIndexedSeq)
        query.processAllAvailable()
        // sentinel batches: push the watermark past max(ts) + 10x gap so
        // every real session's event-time timeout fires and emits
        val maxNanos = rows.iterator.map(_._1).max
        val gapMs = 30L * 60L * 1000L
        for (k <- 1 to 2) {
          input.addData(EventStreams.Event(-k.toLong,
            new java.sql.Timestamp(maxNanos / 1000000L + (100L * k) * gapMs),
            -1L, "sentinel", 0.0))
          query.processAllAvailable()
        }
        s.table(sink)
          .filter(col("user_id") >= 0)
          .select(col("user_id"), col("session_id"), col("n_events"),
            col("start_us"), col("end_us"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toIndexedSeq
          .toDF("user_id", "session_id", "n_events", "start_us", "end_us")
          .orderBy("user_id", "session_id")
      } finally {
        query.stop()
        s.catalog.dropTempView(sink)
        ()
      }
    },
    Some("""WITH marked AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
          OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 1800000000
        THEN 1 ELSE 0 END AS is_new
      FROM events),
    sess AS (
      SELECT user_id, ts_us,
        CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM marked)
    SELECT user_id, session_id, COUNT(*) AS n_events,
      MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
    FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""")
  )

  /** Fourth stream-vs-batch equivalence: the STREAM-STREAM INTERVAL JOIN
    * (E5) under the DuckDB oracle. The events table splits into a click
    * stream and a view stream, both replayed in timestamp order through
    * `correlate` (each click joins the same user's views from the
    * preceding 60 minutes; watermarks on BOTH sides bound the buffered
    * state), and the emitted pairs must hash-match the same interval
    * join DuckDB computes over the table at rest. Pairs whose two sides
    * arrive in DIFFERENT micro-batches prove the cross-batch state
    * buffering; inner-join results emit on match, so no sentinel
    * watermark push is needed. Comparison is at micros precision on
    * both engines (the replay truncates nanos exactly like the other
    * twins).
    */
  val streamJoinTwin: Q = Q(
    "stream_join_twin",
    (s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = Tables(s, dir).events
        .filter(col("event_type").isin("click", "view"))
        .select(col("ts"), col("user_id"), col("event_type"), col("event_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1)
      def toEvent(nanos: Long, uid: Long, et: String, eid: Long): EventStreams.Event = {
        val ts = new java.sql.Timestamp(nanos / 1000000L)
        ts.setNanos(((nanos % 1000000000L) / 1000L * 1000L).toInt)
        EventStreams.Event(eid, ts, uid, et, 0.0)
      }
      val clicksIn = MemoryStream[EventStreams.Event]
      val viewsIn = MemoryStream[EventStreams.Event]
      val sink = s"stream_join_twin_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      // a stream-stream join runs FOUR state stores per shuffle partition,
      // each committed per micro-batch — at the replay's data volume the
      // store commits dominate wall time, so the join runs on fewer
      // partitions (correctness is partition-count-independent; the
      // session conf is restored after the query starts, which pins the
      // stream's own partitioning at start time)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val query =
        try EventStreams.correlate(
          clicksIn.toDF(), viewsIn.toDF(), withinMinutes = 60)
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      try {
        val halves = rows.splitAt(rows.length / 2)
        for (half <- Seq(halves._1, halves._2)) {
          clicksIn.addData(half.filter(_._3 == "click")
            .map { case (n, u, et, e) => toEvent(n, u, et, e) }.toIndexedSeq)
          viewsIn.addData(half.filter(_._3 == "view")
            .map { case (n, u, et, e) => toEvent(n, u, et, e) }.toIndexedSeq)
          query.processAllAvailable()
        }
        s.table(sink)
          .select(col("user_id"), col("click_id"), col("view_id"),
            unix_micros(col("click_ts")).as("click_us"),
            unix_micros(col("view_ts")).as("view_us"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toIndexedSeq
          .toDF("user_id", "click_id", "view_id", "click_us", "view_us")
          .orderBy("user_id", "click_id", "view_id")
      } finally {
        query.stop()
        s.catalog.dropTempView(sink)
        ()
      }
    },
    Some("""SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
      epoch_us(c.ts) AS click_us, epoch_us(v.ts) AS view_us
    FROM events c JOIN events v
      ON c.user_id = v.user_id
     AND c.event_type = 'click' AND v.event_type = 'view'
     AND epoch_us(c.ts) >= epoch_us(v.ts)
     AND epoch_us(c.ts) <= epoch_us(v.ts) + 3600000000
    ORDER BY c.user_id, click_id, view_id""")
  )

  val all: Seq[Q] = Seq(streamNeardupTwin, streamBucketsTwin, streamSessionsTwin,
    streamJoinTwin)
}
