package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** per-user session accumulator for EventStreams.sessionize — top-level so
  * the codegen'd state encoder can reach it
  */
case class SessionState(sessionId: Long, startUs: Long, lastUs: Long, numEvents: Long)

/** Structured Streaming operators (SURVEY §2 E1-E3). Each transform takes a
  * DataFrame/Dataset and works identically on a batch frame or a streaming
  * source — the same declarative plan, so the batch twins in
  * operators.Relational (q_event_buckets, q_sessionize) are literally the
  * same computation with the oracle able to check them.
  *
  * Scale: windowed aggregation state is bounded by the watermark; dedup
  * state by (watermark window x key cardinality); sessionization state is
  * one small struct per active user, dropped on event-time timeout.
  */
object EventStreams {

  /** one event with a proper timestamp column (micros precision) */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long)

  /** E1: tumbling-window counts/sums per event type with a watermark. */
  def hourlyAggregates(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))

  /** E3: drop duplicate event ids within the watermark horizon. */
  def dedupe(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates(Seq("event_id"))

  /** E2: stateful sessionization — a session closes after `gapMinutes` of
    * inactivity (same boundary semantics as the batch gaps-and-islands
    * q_sessionize). flatMapGroupsWithState with event-time timeout: closed
    * sessions are emitted either when a later event arrives past the gap,
    * or when the watermark passes the gap horizon. After a timeout the
    * state collapses to a tiny tombstone (numEvents=0) that preserves the
    * session counter — so per-user session ids stay unique and cumulative —
    * and is itself dropped after a long quiet period (10x gap).
    *
    * Batch-mode caveat: in batch execution timeouts never fire and state is
    * discarded at end-of-data, so each user's final (still-open) session is
    * not emitted — batch output equals q_sessionize minus each user's last
    * session (pinned in EventStreamsSpec).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def us(t: java.sql.Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // batch execution has no watermark concept; treat it as 0
          def wmMs: Long =
            try state.getCurrentWatermarkMs()
            catch { case _: UnsupportedOperationException => 0L }
          if (state.hasTimedOut) {
            val s = state.get
            if (s.numEvents == 0L) {
              state.remove() // tombstone expired: user long quiet
              Iterator.empty
            } else {
              // emit the closed session; keep the counter in a tombstone.
              // Timeouts must sit above the current watermark (it may have
              // advanced far past this user's last event), so clamp.
              state.update(s.copy(numEvents = 0L))
              state.setTimeoutTimestamp(math.max(
                s.lastUs / 1000 + gapMinutes * 60L * 1000 * 10,
                wmMs + gapMinutes * 60L * 1000))
              Iterator.single(SessionOut(userId, s.sessionId, s.numEvents, s.startUs, s.lastUs))
            }
          } else {
            // drop below-watermark (late) events: merging one into an open
            // session could otherwise REGRESS lastUs and shift the gap
            // boundary for every subsequent event.
            val sorted = it.toSeq.filter(e => us(e.ts) / 1000L >= wmMs)
              .sortBy(e => (us(e.ts), e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            for (e <- sorted) {
              val t = us(e.ts)
              cur match {
                case Some(s) if s.numEvents > 0L && t - s.lastUs <= gapUs =>
                  // max(): an in-gap out-of-order event extends the session
                  // but must never move its end backwards
                  cur = Some(s.copy(lastUs = math.max(s.lastUs, t),
                    numEvents = s.numEvents + 1))
                case Some(s) if s.numEvents > 0L =>
                  closed += SessionOut(userId, s.sessionId, s.numEvents, s.startUs, s.lastUs)
                  cur = Some(SessionState(s.sessionId + 1, t, t, 1L))
                case Some(tomb) => // timeout already emitted; continue numbering
                  cur = Some(SessionState(tomb.sessionId + 1, t, t, 1L))
                case None =>
                  cur = Some(SessionState(1, t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // clamp above the watermark: a late-but-processed event could
              // otherwise request a timeout in the past, which throws
              state.setTimeoutTimestamp(math.max(
                s.lastUs / 1000 + gapMinutes * 60L * 1000,
                wmMs + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** E5: stream-stream interval join — each click joins the same user's
    * views from the preceding `withinMinutes`. Both sides carry watermarks
    * and the join condition bounds event time in BOTH directions, so state
    * on each side is evictable (Spark drops buffered rows once the
    * watermark passes the interval) — the property that keeps a
    * stream-stream join's state finite on an unbounded stream.
    */
  def correlate(
      clicks: DataFrame,
      views: DataFrame,
      withinMinutes: Int = 10): DataFrame =
    clicks.withWatermark("ts", s"$withinMinutes minutes").alias("c")
      .join(
        views.withWatermark("ts", s"$withinMinutes minutes").alias("v"),
        expr(s"""c.user_id = v.user_id AND
          c.ts >= v.ts AND c.ts <= v.ts + INTERVAL $withinMinutes MINUTES"""))
      .select(col("c.user_id").as("user_id"),
        col("c.event_id").as("click_id"), col("v.event_id").as("view_id"),
        col("c.ts").as("click_ts"), col("v.ts").as("view_ts"))

  /** E4: streaming ingestion into the lakehouse — the reference's
    * batch pipeline (read files → land in catalog tables) as a continuous
    * flow: a file-source stream appended into a LakeCatalog table per
    * micro-batch via foreachBatch. Each micro-batch is one atomic lake
    * commit (manifest append, no rewrite), so downstream readers see
    * consistent snapshots and can CDC-diff them.
    */
  def streamIntoLake(
      stream: DataFrame,
      catalog: graft.lake.LakeCatalog,
      ns: String,
      table: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        catalog.write(ns, table, batch.toDF(), org.apache.spark.sql.SaveMode.Append)
        (): Unit
      }
      .start()

  /** events table (nanos-long ts) → typed stream-shaped dataset */
  def eventsAsTyped(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), timestamp_micros(expr("ts DIV 1000")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
  }
}
