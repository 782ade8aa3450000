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

  /** E19: stream-static dimension ENRICHMENT join — every event in the
    * stream picks up its dimension attributes (the kafka-topic × dim-table
    * shape every production pipeline has). Stateless: a stream-static
    * inner join buffers nothing, so it is append-able with no watermark
    * and no state store.
    *
    * The dim side is hinted `broadcast(...)` EXPLICITLY — the guarantee
    * for dims the planner cannot PROVE small (in-memory relations,
    * non-parquet sources, post-join/agg shapes): AQE is disabled inside
    * streaming queries, so the runtime 32 MB tier of the session's
    * two-tier broadcast policy never applies here, and the 1 MB
    * static-estimate tier is deliberately too small for a real dim table.
    * Parquet-backed dims need NO hint: HonestBroadcastRule runs in every
    * micro-batch's optimizer and proves them from footer statistics
    * (side.isStreaming guards only the stream side) — pinned hintless in
    * EnrichPlanSpec. With either path, each micro-batch plans a
    * BroadcastHashJoin:
    * the stream partitions stay put, the dim ships once per executor.
    * EnrichPlanSpec pins the executed micro-batch plan (broadcast on the
    * dim, zero exchanges on the stream side).
    *
    * `dim` must be bounded (a dimension, a codebook — anything a planner
    * may legitimately replicate); the stream side may be unbounded.
    */
  def enrichWithDim(
      stream: DataFrame,
      dim: DataFrame,
      joinExpr: org.apache.spark.sql.Column): DataFrame =
    stream.join(broadcast(dim), joinExpr)

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
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    // foreachBatch is AT-LEAST-ONCE: a crash between the lake commit and
    // the checkpoint's commit log re-delivers the same batchId on restart.
    // The appId is the checkpoint location (the stable identity of a
    // streaming query — restarts share it, distinct queries never do), and
    // writeTxn makes the replayed batch a no-op: the Delta txn-action
    // pattern, with the watermark riding in the same atomically-published
    // manifest as the data so sink state and data can never tear.
    val appId = sinkAppId(ns, table, checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        SinkOps.landAppend(catalog, ns, table, appId, batchId, batch.toDF())
        (): Unit
      }
      .start()
  }

  /** Stable idempotence key of a streaming sink: one query (one checkpoint
    * lineage) must map to one appId forever, two different queries
    * appending to the same table must never share one.
    *
    * The checkpoint location is NORMALIZED before hashing (trailing slash,
    * duplicate separators, `.`/`..` segments, relative-vs-absolute, bare
    * path vs `file:` qualification all collapse to one spelling): the
    * appId is the replay guard's identity, and a restart script that
    * spells the SAME checkpoint lineage cosmetically differently would
    * otherwise mint a fresh appId and silently reopen the replay window.
    * Non-file schemes keep their scheme+authority (two object-store
    * buckets must never collide) with only path normalization applied.
    */
  private[graft] def sinkAppId(ns: String, table: String, checkpoint: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpoint) // collapses //, ., trailing /
    val uri = p.toUri
    val canonical =
      if (uri.getScheme == null || uri.getScheme == "file")
        // local lineage: absolute filesystem path, scheme-free — the one
        // spelling `file:/x`, `file:///x`, `/x` and `x` (from cwd) share
        new org.apache.hadoop.fs.Path(
          new java.io.File(uri.getPath).getAbsolutePath).toString
      else p.toString
    s"graft-stream:$ns.$table:" + java.util.UUID.nameUUIDFromBytes(
      canonical.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** E22: a lake table as a STREAMING SOURCE — the inverse of
    * [[streamIntoLake]]: tail a table's snapshot lineage as micro-batches
    * (offset = snapshot version; see
    * [[org.apache.spark.sql.graft.LakeStreamSource]] for window
    * semantics). Composed with [[streamIntoLake]]'s txn watermark this is
    * an end-to-end exactly-once lake→lake incremental pipeline.
    */
  def readLakeStream(
      spark: SparkSession,
      root: String,
      ns: String,
      table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.format("graft-lake")
      .option("root", root).option("table", s"$ns.$table")
      .options(options).load()

  /** E24 (r14, VERDICT r13 #3): LAKE→LAKE CHANGE-DATA REPLICATION — the
    * E23 change-feed source composed with the E11 CDC APPLY sink, so a
    * downstream table CONVERGES to the source through NON-APPEND windows
    * (UPDATE/DELETE/overwrite), not just appends: each micro-batch is one
    * snapshot-diff window whose `_change` rows map to the Debezium shape
    * (`insert`→upsert, `delete`→tombstone) and land through
    * [[graft.lake.TableMerger.applyCdc]] in ONE file-scoped pass.
    *
    * Within a window a key appears at most once per side of the diff (the
    * changelog is a NET snapshot diff), so an UPDATE arrives as its
    * delete/insert pair and applyCdc's documented upsert-wins tie-break
    * keeps exactly the new row — no ordering column needed. Exactly-once
    * under restart: the source's version offsets ride the checkpoint
    * (+ persisted position markers) and the sink's txn watermark makes a
    * replayed window a no-op.
    *
    * At 100 TB: per trigger the source plans from two KB-sized manifests
    * and scans only CHANGED commits; the apply rewrites only the commits
    * holding matched keys. Replication cost tracks the CHANGE RATE, not
    * the table size — the property continuous replication needs.
    */
  def replicateLakeToLake(
      spark: SparkSession,
      srcRoot: String,
      srcNs: String,
      srcTable: String,
      catalog: graft.lake.LakeCatalog,
      dstNs: String,
      dstTable: String,
      keys: Seq[String],
      checkpoint: String,
      options: Map[String, String] = Map.empty): org.apache.spark.sql.streaming.StreamingQuery = {
    val feed0 = readLakeStream(spark, srcRoot, srcNs, srcTable,
      options + ("changefeed" -> "true"))
    // a source whose DATA already carries `_op` would be silently clobbered
    // by the CDC op column below and then dropped by applyCdc — refuse
    // loudly, the `_change` collision treatment (ADVICE r14)
    require(!feed0.schema.fieldNames.contains("_op"),
      s"$srcNs.$srcTable already has an `_op` column — replication would " +
        "clobber it with CDC op metadata; rename the column before replicating")
    val feed = feed0
      .withColumn("_op",
        when(col("_change") === lit("delete"), lit("delete"))
          .otherwise(lit("upsert")))
      .drop("_change")
    streamCdcApplyKeysIntoLake(feed, catalog, dstNs, dstTable, keys, checkpoint)
  }

  /** E21: AUDITED streaming ingestion — every micro-batch commits onto a
    * BRANCH (invisible to main readers), so a whole streaming session
    * publishes to main ATOMICALLY via one fast-forward after an
    * end-of-stream audit: the branch generalization of per-batch WAP
    * (write-audit-publish audits one commit; this audits the session's
    * whole lineage while main serves the last published state
    * throughout). The branch CAS also means a concurrent main writer
    * turns the publish into a loud conflict instead of an interleaving.
    */
  def streamIntoBranch(
      stream: DataFrame,
      catalog: graft.lake.LakeCatalog,
      ns: String,
      table: String,
      branch: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    // same retry-idempotence guard as streamIntoLake; the watermark lives
    // in the branch manifest and fast-forwards to main with the publish,
    // so a replay no-ops on either side of the merge
    val appId = sinkAppId(ns, table, checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        catalog.writeBranchTxn(ns, table, branch, appId, batchId, batch.toDF())
        (): Unit
      }
      .start()
  }

  // ----- E7: streaming near-duplicate detection ---------------------------

  /** E4b: streaming CDC UPSERT into the lakehouse — each micro-batch lands
    * through [[graft.lake.TableMerger]], so late corrections to
    * already-landed keys UPDATE in place instead of appending duplicates
    * (the reference's merge strategies, continuously applied). Combined
    * with the file-scoped MERGE this is the scale shape of a streaming CDC
    * sink: per batch, only the commits holding corrected keys are
    * rewritten; pure-insert batches cost one fresh commit.
    */
  def streamUpsertIntoLake(
      stream: DataFrame,
      catalog: graft.lake.LakeCatalog,
      ns: String,
      table: String,
      key: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    // MERGE converges under replay by construction (same keys upsert to
    // the same rows), so correctness never needed a guard — the watermark
    // makes a replayed batch SKIP the merge entirely (exactly-once result
    // was already true; this buys at-most-twice WORK, the crash window
    // being one redundant convergent merge before the record lands)
    val appId = sinkAppId(ns, table, checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        SinkOps.landUpsert(catalog, ns, table, key, appId, batchId, batch.toDF())
        (): Unit
      }
      .start()
  }

  /** E11: streaming CDC APPLY into the lakehouse — the full Debezium
    * shape: micro-batches carry upsert rows AND delete tombstones (an
    * `_op` column), each batch landing through
    * [[graft.lake.TableMerger.applyCdc]] as ONE file-scoped pass. Late
    * corrections update in place, tombstones remove rows, and a batch
    * touching both rewrites each affected commit once. This is the sink
    * a replicated OLTP table needs: the stream IS the redo log, the
    * lake table converges to the source state.
    *
    * Pass `orderCol` (the feed's ts/LSN column) so a key carrying BOTH an
    * upsert and a tombstone inside one micro-batch resolves to the LATEST
    * event — without it, applyCdc's documented upsert-wins tie-break
    * would let an insert-then-delete row survive and the table would
    * diverge from the source.
    */
  def streamCdcApplyIntoLake(
      stream: DataFrame,
      catalog: graft.lake.LakeCatalog,
      ns: String,
      table: String,
      key: String,
      checkpoint: String,
      orderCol: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    streamCdcApplyKeysIntoLake(stream, catalog, ns, table, Seq(key), checkpoint,
      orderCol)

  /** [[streamCdcApplyIntoLake]] on a COMPOSITE key tuple (r15) — the
    * replica shape for sources whose identity is multi-column (the
    * mergeTableKeys analog on the streaming path).
    */
  def streamCdcApplyKeysIntoLake(
      stream: DataFrame,
      catalog: graft.lake.LakeCatalog,
      ns: String,
      table: String,
      keys: Seq[String],
      checkpoint: String,
      orderCol: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    // same replay-skip watermark as streamUpsertIntoLake: applyCdc
    // converges under replay (latest-event-wins), the guard skips the work
    val appId = sinkAppId(ns, table, checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        SinkOps.landCdc(catalog, ns, table, keys, appId, batchId, batch.toDF(), orderCol)
        (): Unit
      }
      .start()
  }

  /** one incoming document on the stream */
  case class DocIn(doc_id: Long, ts: java.sql.Timestamp, text: String)

  /** a banded signature row (internal shape of the stateful stage); `sig`
    * is a primitive long array — the per-pair signature agreement count is
    * the stateful stage's hot loop, and boxed Seq traversal was a measured
    * multiple of it at the sf10 soak
    */
  case class SigDoc(doc_id: Long, ts: java.sql.Timestamp, band: Int, bh: Long,
      sig: Array[Long])

  case class BucketEntry(id: Long, sig: Array[Long])
  case class BucketState(entries: List[BucketEntry])

  /** an emitted near-dup candidate (a < b), with the triggering doc's ts */
  case class DupCandidate(a: Long, b: Long, est_jaccard: Double,
      ts: java.sql.Timestamp)

  /** E7: streaming MinHash near-dup detection — the batch LSH pipeline's
    * exact signature expressions (native graft_shingle_hashes /
    * graft_minhash_sig, columnar and stateless) run unchanged on the
    * stream; the only stateful piece is the bucket memory: state per
    * (band, bucket-hash) key holds the first `Dedup.MaxBucket` (id,
    * signature) entries seen, each ADMITTED doc is compared against the
    * entries before it, and pairs at or above `threshold` estimated
    * Jaccard are emitted as they happen. An arrival past the cap is
    * dropped without screening — the same treatment the batch path gives
    * bucket members beyond the min-k cut (Dedup.candidatePairs), so
    * stream == batch holds even on the buckets where the cap engages.
    *
    * Everything is bounded: state per key by the MaxBucket cap (a
    * degenerate spam bucket stores 64 entries, not millions), state
    * across keys by an event-time TTL — buckets quiet past the watermark
    * horizon are dropped — and, because emission is admission-gated, a
    * bucket's lifetime OUTPUT by C(MaxBucket, 2) (the pre-r11 behavior of
    * screening over-cap arrivals emitted up to 64 pairs per arrival
    * forever: unbounded downstream load from bounded state, and 13.5M
    * extra rows vs batch at the sf10 soak). A pair colliding in several
    * bands emits once per band (keys are independent); land the stream
    * through a batch dedup or dropDuplicates when exact-once pairs are
    * required.
    *
    * Replayed-stream equivalence: the `stream_neardup_twin` driver query
    * replays the dedup corpus through this operator and hash-matches the
    * batch pipeline's DuckDB oracle — stream == batch, est values
    * included. Caveat inherited from Structured Streaming: the global
    * watermark starts at epoch 0, so documents stamped at or below epoch 0
    * are dropped as late before reaching the operator — replays must use
    * realistic event times.
    */
  def nearDupCandidates(
      docs: Dataset[DocIn],
      threshold: Double = 0.5,
      ttlMinutes: Int = 60): Dataset[DupCandidate] = {
    import docs.sparkSession.implicits._
    import graft.operators.Dedup
    val ttlMs = ttlMinutes * 60L * 1000L

    def estJac(a: Array[Long], b: Array[Long]): Double = {
      // fixed-length contract: both sides are NumPerms-long signatures from
      // minhashSignature — make a violation loud, not an out-of-bounds read
      require(a.length == b.length,
        s"minhash signature length mismatch: ${a.length} vs ${b.length}")
      var c = 0; var i = 0
      while (i < a.length) { if (a(i) == b(i)) c += 1; i += 1 }
      c.toDouble / Dedup.NumPerms
    }

    docs.toDF()
      .withWatermark("ts", s"$ttlMinutes minutes")
      .select(col("doc_id"), col("ts"),
        Dedup.minhashSignature(Dedup.shingleHashes(col("text"))).as("sig"))
      .select(col("doc_id"), col("ts"), explode(Dedup.bandKeys(col("sig"))).as("b"),
        col("sig"))
      .select(col("doc_id"), col("ts"), col("b.band").as("band"),
        col("b.bh").as("bh"), col("sig"))
      .as[SigDoc]
      .groupByKey(d => (d.band, d.bh))
      .flatMapGroupsWithState[BucketState, DupCandidate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, Long), it: Iterator[SigDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            val out = Seq.newBuilder[DupCandidate]
            // deterministic within-batch order, same tie-break as batch
            val sorted = it.toSeq.sortBy(x => (x.ts.getTime, x.doc_id))
            for (d <- sorted) {
              // pairs are emitted ONLY when the arriving doc is itself
              // admitted to the bucket — the exact batch semantics (pairs
              // among the capped member set, Dedup.candidatePairs). The
              // pre-r11 version also screened over-cap arrivals against the
              // retained entries: strictly more pairs, but (a) it silently
              // broke the stream==batch twin contract the moment the cap
              // engaged (sf10: 31.6M stream rows vs 18.1M batch), and (b) a
              // degenerate spam bucket emitted 64 pairs per arrival FOREVER
              // — unbounded downstream load from bounded state. Admission
              // gating bounds a bucket's lifetime output at C(cap,2).
              if (entries.length < Dedup.MaxBucket && !entries.exists(_.id == d.doc_id)) {
                for (e <- entries) {
                  val est = estJac(e.sig, d.sig)
                  if (est >= threshold)
                    out += DupCandidate(math.min(e.id, d.doc_id),
                      math.max(e.id, d.doc_id), est, d.ts)
                }
                entries = entries :+ BucketEntry(d.doc_id, d.sig)
              }
            }
            state.update(BucketState(entries))
            // TTL counts from this bucket's LAST EVENT (the watermark at
            // arming time lags a full trigger behind and would expire the
            // bucket prematurely); clamp above the watermark, which only
            // matters for very late stragglers
            val batchMaxMs = sorted.map(_.ts.getTime).max
            val wmMs =
              try state.getCurrentWatermarkMs()
              catch { case _: UnsupportedOperationException => 0L }
            try state.setTimeoutTimestamp(math.max(batchMaxMs + ttlMs, wmMs + 1))
            catch { case _: UnsupportedOperationException => () }
            out.result().iterator
          }
      }
  }

  /** one incoming embedded vector on the stream; `cluster` is assigned by
    * the stateless centroid projection (graft_nearest_centroid) before the
    * stateful stage — in production the centroids live in a lake table and
    * the expression runs in-stream, exactly like the batch path
    */
  case class VecIn(vec_id: Long, ts: java.sql.Timestamp, cluster: Int,
      embedding: Seq[Float])

  /** `emb` is a primitive float array: the witness scan computes a cosine
    * against up to [[graft.operators.Dedup.MaxSemCluster]] retained entries
    * per incoming vector, and boxed Seq access was the measured hot cost of
    * the sf10 twin (each get unboxes through WrappedArray).
    */
  case class ClusterEntry(id: Long, emb: Array[Float])
  /** `capWarned` lives in state (not a per-batch local) so a persistently
    * over-cap cluster logs its truncation warning once per cluster
    * lifetime, not once per micro-batch — a long soak with a hot cluster
    * would otherwise flood the log at every trigger.
    */
  case class SemClusterState(entries: List[ClusterEntry],
      capWarned: Boolean = false)

  /** an eliminated vector with its lowest-id witness duplicate */
  case class SemDup(vec_id: Long, dup_of: Long, cluster: Long)

  /** bit-identical to functions.CosineSim.compute (same accumulation order,
    * same float→double widening) so stream == batch == oracle exactly */
  private def cosArr(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** E17: ONLINE SemDeDup — the streaming twin of the batch semantic dedup
    * (operators.Dedup.dedupSemantic). Cluster assignment is the same
    * stateless codegen projection as batch; the only stateful piece is the
    * per-cluster seen-set: each arriving vector screens against the
    * vectors already seen in its cluster and is emitted as eliminated
    * (with its lowest-id witness) when any cosine clears the threshold.
    * Eliminated vectors still join the seen-set — the batch semantics,
    * where any lower id is a valid witness.
    *
    * State per cluster is the cluster's seen vector set — the same memory
    * the batch screen holds per cluster, bounded THREE ways: by cluster
    * sizing (K is the knob), by the event-time TTL, which drops clusters
    * quiet past the watermark horizon, and by a hard per-cluster cap
    * (`maxPerCluster`, the E7 MaxBucket treatment): once a cluster
    * retains that many vectors, later arrivals still screen against the
    * retained set — and are emitted with correct witnesses when they
    * match — but no longer join it, so a hot (or adversarially spammed)
    * cluster's state store entry stays O(cap) floats instead of O(cluster
    * size). Production sizing keeps clusters well under the cap
    * (K ≈ corpus/5k); the cap is the backstop for the one cluster that
    * breaks the sizing assumption, trading completeness only of
    * over-cap-vs-over-cap pairs (retained members' witness sets are
    * unaffected — pinned in EventStreamsSpec).
    *
    * When the replay arrives in id order (the twin does; a production
    * backfill should), the emitted set is EXACTLY the batch output;
    * under arbitrary arrival order the screen is best-effort-monotone:
    * only lower-id entries count as witnesses, so a vector is never
    * eliminated by a later id.
    */
  def semanticDedupStream(
      vecs: Dataset[VecIn],
      threshold: Double = graft.operators.Dedup.SemThreshold,
      ttlMinutes: Int = 60,
      maxPerCluster: Int = graft.operators.Dedup.MaxSemCluster): Dataset[SemDup] = {
    import vecs.sparkSession.implicits._
    val ttlMs = ttlMinutes * 60L * 1000L
    vecs.toDF()
      .withWatermark("ts", s"$ttlMinutes minutes")
      .as[VecIn]
      .groupByKey(_.cluster)
      .flatMapGroupsWithState[SemClusterState, SemDup](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (cluster: Int, it: Iterator[VecIn], state: GroupState[SemClusterState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // Retained entries are kept ASCENDING BY ID (insertion below
            // preserves it; defensively restored for state written before
            // the invariant): the min-id witness is then the FIRST match of
            // an in-order scan, and the scan can stop at e.id >= v.vec_id —
            // without the order, every incoming vector pays a full
            // maxPerCluster cosine sweep (the sf10 twin's measured cost).
            val entries = scala.collection.mutable.ArrayBuffer
              .from(state.getOption.map(_.entries).getOrElse(Nil))
            if (entries.length > 1 &&
                entries.iterator.sliding(2).exists(p => p.head.id > p.last.id))
              entries.sortInPlaceBy(_.id)
            val seen = scala.collection.mutable.Set.from(entries.iterator.map(_.id))
            val out = Seq.newBuilder[SemDup]
            var capWarned = state.getOption.exists(_.capWarned)
            // deterministic within-batch order, same tie-break as batch
            val sorted = it.toSeq.sortBy(v => (v.ts.getTime, v.vec_id))
            for (v <- sorted) {
              val vec = v.embedding.toArray
              var witness = -1L
              var i = 0
              while (witness < 0 && i < entries.length && entries(i).id < v.vec_id) {
                if (cosArr(entries(i).emb, vec) >= threshold) witness = entries(i).id
                i += 1
              }
              if (witness >= 0)
                out += SemDup(v.vec_id, witness, cluster.toLong)
              if (entries.length < maxPerCluster && seen.add(v.vec_id)) {
                // binary-search insert keeps the ascending-id invariant
                var lo = 0; var hi = entries.length
                while (lo < hi) {
                  val m = (lo + hi) >>> 1
                  if (entries(m).id < v.vec_id) lo = m + 1 else hi = m
                }
                entries.insert(lo, ClusterEntry(v.vec_id, vec))
              } else if (entries.length >= maxPerCluster && !seen.contains(v.vec_id) && !capWarned) {
                // observable truncation: past the cap this operator can
                // MISS duplicates a batch pass would find (the K sizing in
                // operators.Dedup keeps clusters ~4x under the cap so this
                // never fires on a sanely-clustered corpus — if it fires,
                // the cluster count is undersized for the corpus)
                capWarned = true
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"semanticDedupStream: cluster $cluster hit the $maxPerCluster-entry " +
                    "retention cap - later vectors in it are screened against a " +
                    "TRUNCATED seen-set and stream may under-report duplicates vs batch")
              }
            }
            state.update(SemClusterState(entries.toList, capWarned))
            val batchMaxMs = sorted.map(_.ts.getTime).max
            val wmMs =
              try state.getCurrentWatermarkMs()
              catch { case _: UnsupportedOperationException => 0L }
            try state.setTimeoutTimestamp(math.max(batchMaxMs + ttlMs, wmMs + 1))
            catch { case _: UnsupportedOperationException => () }
            out.result().iterator
          }
      }
  }

  /** events table → typed stream-shaped dataset (`ts` arrives as a native
    * TimestampType via the Tables.events canonicalization) */
  def eventsAsTyped(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    graft.Tables(spark, dir).events
      .select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
  }
}
