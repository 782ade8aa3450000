package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {

  import EventStreams._

  // base offset one day past the epoch: rows at/below the initial watermark
  // (epoch 0) would be discarded as late by stateful streaming operators
  private def ts(minutes: Long): Timestamp = new Timestamp((1440 + minutes) * 60000L)

  private def ev(id: Long, minutes: Long, user: Long, typ: String = "click",
      v: Double = 1.0): Event = Event(id, ts(minutes), user, typ, v)

  test("E1: streaming windowed aggregation with watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = hourlyAggregates(input.toDF())
      .writeStream.format("memory").queryName("e1_out").outputMode("complete").start()
    try {
      input.addData(ev(1, 10, 1), ev(2, 20, 1), ev(3, 70, 2, "view"))
      q.processAllAvailable()
      val rows = spark.table("e1_out")
        .select(col("event_type"), col("n_events"), col("total_value")).collect()
      val byType = rows.map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(byType("click") == (2L, 2.0)) // both clicks in hour 0
      assert(byType("view") == (1L, 1.0))  // view in hour 1
    } finally q.stop()
  }

  test("E2: streaming sessionization closes sessions on gap and timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS())
      .writeStream.format("memory").queryName("e2_out").outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then 2h silence
      input.addData(ev(1, 0, 1), ev(2, 10, 1))
      q.processAllAvailable()
      input.addData(ev(3, 130, 1)) // gap > 30min → closes session 1 on arrival
      q.processAllAvailable()
      // advance watermark far past user 1's last event → session 2 times out
      input.addData(ev(9, 600, 2))
      q.processAllAvailable()
      input.addData(ev(10, 610, 2))
      q.processAllAvailable()
      val sessions = spark.table("e2_out").as[SessionOut].collect()
        .filter(_.user_id == 1).sortBy(_.session_id)
      assert(sessions.length == 2, s"got ${sessions.mkString(",")}")
      assert(sessions(0).n_events == 2)
      assert(sessions(1).n_events == 1)
      // session ids stay unique and cumulative even across a timeout close
      assert(sessions.map(_.session_id).toSeq == Seq(1L, 2L))
      // user 1 returns after the timeout → continues numbering, no reuse
      input.addData(ev(20, 620, 1))
      q.processAllAvailable()
      input.addData(ev(21, 700, 1), ev(22, 1500, 2)) // closes session 3 by gap;
      q.processAllAvailable() // ev22 advances watermark → session 4 times out too
      val later = spark.table("e2_out").as[SessionOut].collect()
        .filter(_.user_id == 1).map(_.session_id).sorted.toSeq
      assert(later == Seq(1L, 2L, 3L, 4L), s"got $later")
    } finally q.stop()
  }

  test("E2: below-watermark (late) events are dropped, not merged into sessions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS())
      .writeStream.format("memory").queryName("e2_late_out").outputMode("append").start()
    try {
      input.addData(ev(1, 0, 1)) // user 1 session at t=0
      q.processAllAvailable()
      input.addData(ev(2, 1000, 2)) // watermark → ~970min; user 1 times out
      q.processAllAvailable()
      input.addData(ev(3, 100, 1)) // LATE for user 1 (t=100 << watermark)
      q.processAllAvailable()
      input.addData(ev(4, 1100, 1)) // fresh on-time session for user 1
      q.processAllAvailable()
      input.addData(ev(5, 3000, 2)) // advance watermark → user 1 times out again
      q.processAllAvailable()
      val u1 = spark.table("e2_late_out").as[SessionOut].collect()
        .filter(_.user_id == 1).sortBy(_.start_us)
      // the late event must not have opened (or extended) any session
      assert(u1.length == 2, s"late event leaked into sessions: ${u1.mkString(",")}")
      assert(u1.map(_.start_us).toSeq == Seq(ts(0).getTime * 1000, ts(1100).getTime * 1000))
    } finally q.stop()
  }

  test("E3: streaming dedup drops repeated event ids") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = dedupe(input.toDF())
      .writeStream.format("memory").queryName("e3_out").outputMode("append").start()
    try {
      input.addData(ev(1, 0, 1), ev(1, 0, 1), ev(2, 5, 1))
      q.processAllAvailable()
      input.addData(ev(2, 5, 1), ev(3, 10, 1))
      q.processAllAvailable()
      assert(spark.table("e3_out").count() == 3)
    } finally q.stop()
  }

  test("E5: stream-stream interval join correlates clicks with recent views") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = correlate(clicks.toDF(), views.toDF())
      .writeStream.format("memory").queryName("e5_out").outputMode("append").start()
    try {
      views.addData(ev(100, 0, 1, "view"), ev(101, 5, 1, "view"), ev(102, 0, 2, "view"))
      clicks.addData(ev(200, 8, 1), ev(201, 30, 1)) // 201 is >10min after both views
      q.processAllAvailable()
      val rows = spark.table("e5_out")
        .select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // click 200 (t=8) joins views 100 (t=0) and 101 (t=5); click 201
      // (t=30) matches nothing; user 2's view never joins user 1's clicks
      assert(rows == Set((200L, 100L), (200L, 101L)), rows.toString)
    } finally q.stop()
  }

  test("E4: file-source stream lands in the lake as per-batch snapshots") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val cat = graft.lake.LakeCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_stream_lake").toString)
    // land one flat parquet file per "arrival" (file source watches srcDir)
    def land(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_stream_tmp").toString
      rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    }
    land("f1", Seq((1L, "a"), (2L, "b")))
    val stream = spark.readStream
      .schema("id LONG, v STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val q = EventStreams.streamIntoLake(stream, cat, "stream", "events_in", ckpt)
    try {
      q.processAllAvailable()
      assert(cat.rowCount("stream", "events_in") == 2)
      // a new file arrives → next micro-batch → new lake snapshot
      land("f2", Seq((3L, "c")))
      q.processAllAvailable()
      assert(cat.rowCount("stream", "events_in") == 3)
      assert(cat.versions("stream", "events_in").size >= 2)
      // earlier snapshot still time-travelable
      assert(cat.read("stream", "events_in", Some(1)).count() == 2)
    } finally q.stop()
  }

  test("E6: text quality gate + token accounting runs unchanged on a document stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the same declarative quality/token expressions the batch operators
    // use apply to a streaming frame with zero changes — proof the text
    // pipeline is streaming-ready (stateless narrow transforms)
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val toks = graft.operators.TextAnalysis.wsTokens(col("text"))
    val gated = docs
      .withColumn("n_tokens", size(toks))
      .filter(col("n_tokens") >= 3)
    val q = gated.writeStream.format("memory").queryName("e6_out")
      .outputMode("append").start()
    try {
      input.addData((1L, "too short"), (2L, "this one has plenty of tokens"),
        (3L, "x"), (4L, "another sufficiently long document here"))
      q.processAllAvailable()
      val kept = spark.table("e6_out").select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(kept == Seq(2L, 4L), kept.toString)
    } finally q.stop()
  }

  test("batch twin: sessionize in batch mode matches q_sessionize closed sessions") {
    import spark.implicits._
    // In batch execution each user's whole history arrives as one group and
    // the trailing open session is never emitted: batch sessionize ==
    // q_sessionize minus each user's last session.
    val streamed = sessionize(eventsAsTyped(spark, sfDir))
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.operators.Relational.qSessionize.fn(spark, sfDir)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.nonEmpty)
    for ((u, n) <- batch) {
      assert(streamed.getOrElse(u, 0L) == n - 1, s"user $u: batch=$n streamed=${streamed.get(u)}")
    }
  }

  test("E4b: streaming CDC upsert updates keys in place across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val cat = graft.lake.LakeCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_stream_upsert").toString)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_upsert_ck").toString
    val input = MemoryStream[(Long, String)]
    val q = streamUpsertIntoLake(
      input.toDS().toDF("id", "v"), cat, "cdc", "t", "id", ckpt)
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(cat.rowCount("cdc", "t") == 2)
      // batch 2: correction for id=2 plus a new key — must upsert, not append
      input.addData((2L, "B"), (3L, "c"))
      q.processAllAvailable()
      val rows = cat.read("cdc", "t").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "a"), (2L, "B"), (3L, "c")), rows.toString)
      // versions: (CTAS + its txn watermark) then (one MERGE commit + its
      // watermark) per non-empty batch — the r12 replay-skip guard records
      // a metadata-only version after each applied batch
      assert(cat.versions("cdc", "t") == Seq(1, 2, 3, 4))
      assert(cat.txnVersion("cdc", "t",
        EventStreams.sinkAppId("cdc", "t", ckpt)).contains(1L))
    } finally q.stop()
  }

  test("E11: streaming CDC apply handles upserts AND tombstones per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val cat = graft.lake.LakeCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_stream_cdc").toString)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_cdc_ck").toString
    val input = MemoryStream[(Long, String, String)]
    val q = streamCdcApplyIntoLake(
      input.toDS().toDF("id", "v", "_op"), cat, "cdc", "t", "id", ckpt)
    try {
      input.addData((1L, "a", "upsert"), (2L, "b", "upsert"), (3L, "c", "upsert"))
      q.processAllAvailable()
      assert(cat.rowCount("cdc", "t") == 3)
      // batch 2: correction + tombstone + insert + absent-key tombstone,
      // one file-scoped pass
      input.addData((2L, "B", "upsert"), (3L, "x", "delete"),
        (4L, "d", "upsert"), (99L, "x", "delete"))
      q.processAllAvailable()
      val rows = cat.read("cdc", "t").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "a"), (2L, "B"), (4L, "d")), rows.toString)
      // versions: (CDC-create + watermark) then (ONE apply commit for the
      // mixed batch + watermark) — r12 replay-skip accounting
      assert(cat.versions("cdc", "t") == Seq(1, 2, 3, 4))
      assert(cat.txnVersion("cdc", "t",
        EventStreams.sinkAppId("cdc", "t", ckpt)).contains(1L))
    } finally q.stop()
  }

  test("E11 with orderCol: insert-then-delete inside ONE micro-batch converges to source") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val cat = graft.lake.LakeCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_stream_cdc_ord").toString)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_cdc_ord_ck").toString
    val input = MemoryStream[(Long, String, String, Long)]
    val q = streamCdcApplyIntoLake(
      input.toDS().toDF("id", "v", "_op", "lsn"), cat, "cdc", "t", "id", ckpt,
      orderCol = Some("lsn"))
    try {
      input.addData((1L, "a", "upsert", 1L), (2L, "b", "upsert", 2L))
      q.processAllAvailable()
      // ONE micro-batch where key 2 is deleted then re-inserted, key 1 is
      // inserted then deleted, key 3 is inserted then updated — the lake
      // table must converge to the source's final state, not upsert-wins
      input.addData(
        (1L, "A", "upsert", 10L), (1L, "x", "delete", 11L),
        (2L, "x", "delete", 10L), (2L, "B2", "upsert", 11L),
        (3L, "c", "upsert", 10L), (3L, "C", "upsert", 11L))
      q.processAllAvailable()
      val rows = cat.read("cdc", "t").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((2L, "B2"), (3L, "C")), rows.toString)
    } finally q.stop()
  }

  test("E11 composite keys: tuple-identity CDC apply converges (r15)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val cat = graft.lake.LakeCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_stream_cdck").toString)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_cdck_ck").toString
    val input = MemoryStream[(Long, Long, String, String)]
    val q = streamCdcApplyKeysIntoLake(
      input.toDS().toDF("id", "sub", "v", "_op"), cat, "cdc", "ck",
      Seq("id", "sub"), ckpt)
    try {
      input.addData((1L, 10L, "a", "upsert"), (1L, 20L, "b", "upsert"),
        (2L, 10L, "c", "upsert"))
      q.processAllAvailable()
      // correction for the (1, 20) TUPLE only, tombstone for (2, 10), and
      // a new (2, 20): single-column identity would clobber (1, 10)
      input.addData((1L, 20L, "B!", "upsert"), (2L, 10L, "x", "delete"),
        (2L, 20L, "d", "upsert"))
      q.processAllAvailable()
      val rows = cat.read("cdc", "ck").orderBy("id", "sub")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      assert(rows == Seq((1L, 10L, "a"), (1L, 20L, "B!"), (2L, 20L, "d")),
        rows.toString)
    } finally q.stop()
  }

  test("E24: composite-key replica converges through UPDATE/DELETE windows (r15)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_repk_")
    val cat = graft.lake.LakeCatalog(spark, root.resolve("lake").toString)
    val base = (1L to 12L).map(i => (i % 4, i, s"v$i")).toDF("grp", "seq", "v")
    cat.write("rep", "src", base.filter(col("seq") <= 8))
    cat.write("rep", "src", base.filter(col("seq") > 8),
      org.apache.spark.sql.SaveMode.Append)
    val cp = root.resolve("cp").toString
    def pass(): Unit = {
      val q = replicateLakeToLake(spark, cat.root, "rep", "src",
        cat, "rep", "dst", Seq("grp", "seq"), cp)
      try q.processAllAvailable() finally q.stop()
    }
    pass() // initial snapshot
    cat.update("rep", "src", Seq("v" -> concat(col("v"), lit("!"))),
      col("seq") % 3 === 0)
    cat.delete("rep", "src", col("seq") % 5 === 0)
    pass() // the UPDATE+DELETE diff window applies on the tuple key
    val dst = cat.read("rep", "dst").orderBy("seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val src = cat.read("rep", "src").orderBy("seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(dst == src, s"replica must equal source; dst=$dst src=$src")
  }

  test("E24 policy pin: schema evolution replicates PROJECT-AND-APPLY; a restart refreshes the schema (r15)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_repsch_")
    val cat = graft.lake.LakeCatalog(spark, root.resolve("lake").toString)
    cat.write("rep", "esrc", (1L to 6L).map(i => (i, s"v$i")).toDF("id", "v"))
    val cp = root.resolve("cp").toString
    def pass(): Unit = {
      val q = replicateLakeToLake(spark, cat.root, "rep", "esrc",
        cat, "rep", "edst", Seq("id"), cp)
      try q.processAllAvailable() finally q.stop()
    }
    pass() // replica at the original (id, v) schema
    assert(cat.read("rep", "edst").columns.sorted.toSeq == Seq("id", "v"))
    // the source EVOLVES: a later commit carries an extra column `w`
    cat.write("rep", "esrc",
      (7L to 9L).map(i => (i, s"v$i", i * 10.0)).toDF("id", "v", "w"),
      org.apache.spark.sql.SaveMode.Append)
    // a RESTARTED replication (the policy: the stream's schema is pinned
    // per SESSION and refreshed at restart) picks the evolved schema up:
    // new rows carry w, pre-evolution replica rows null-fill — the
    // project-and-apply contract, not a refusal, because applyCdc's
    // unionByName(allowMissingColumns) makes the widened replica converge
    pass()
    val dst = cat.read("rep", "edst").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    assert(dst.map(_._1) == (1L to 9L), dst.toString)
    assert(dst.filter(_._1 <= 6).forall(_._3 == null),
      s"pre-evolution rows null-fill the new column: $dst")
    assert(dst.filter(_._1 >= 7).map(_._3) == Seq(70.0, 80.0, 90.0), dst.toString)
  }

  test("stream_sessions_twin == batch gaps-and-islands on sf0.001 (every session emitted)") {
    // Spark-vs-Spark pin of the new driver query: the streamed sessions
    // (including each user's FINAL session, closed via the sentinel
    // watermark push) must equal the batch window computation exactly
    import org.apache.spark.sql.expressions.Window
    val streamed = StreamingQueries.streamSessionsTwin.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val batch = graft.Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(cum).cast("long"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
      .orderBy("user_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(streamed.length == batch.length,
      s"session count: streamed=${streamed.length} batch=${batch.length}")
    assert(streamed.sameElements(batch))
  }

  test("stream_join_twin == batch interval join on sf0.001 (cross-batch pairs included)") {
    val streamed = StreamingQueries.streamJoinTwin.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val ev = graft.Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"), col("event_type"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("us").as("click_us"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("event_id").as("view_id"), col("us").as("view_us"))
    val batch = c.join(v, col("user_id") === col("v_uid") &&
        col("click_us") >= col("view_us") &&
        col("click_us") <= col("view_us") + 3600000000L)
      .select("user_id", "click_id", "view_id", "click_us", "view_us")
      .orderBy("user_id", "click_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(batch.nonEmpty, "test corpus must produce at least one pair")
    assert(streamed.sameElements(batch),
      s"streamed=${streamed.length} batch=${batch.length}")
  }

  test("E7: near-dups arriving in the SAME micro-batch pair immediately") {
    // regression guard for the round-4 twin investigation: within one
    // bucket invocation, each doc must see same-batch predecessors (and
    // event times must sit above epoch 0, or the watermark's late filter
    // silently drops them before the operator)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog and keeps on running " +
      "through the quiet field toward the river bank before sunset tonight"
    val base = 1700000000000L
    val input = MemoryStream[DocIn]
    val q = nearDupCandidates(input.toDS(), threshold = 0.5)
      .writeStream.format("memory").queryName("e7_same_batch").outputMode("append").start()
    try {
      input.addData(
        DocIn(1L, new java.sql.Timestamp(base), text),
        DocIn(2L, new java.sql.Timestamp(base + 1), text))
      q.processAllAvailable()
      val pairs = spark.table("e7_same_batch").as[DupCandidate].collect()
        .map(c => (c.a, c.b)).distinct.toSeq
      assert(pairs == Seq((1L, 2L)), s"same-batch pair not emitted: $pairs")
    } finally q.stop()
  }

  test("E7 batch twin: replayed corpus reproduces the batch minhash pairs exactly") {
    // the driver checks this via stream_neardup_twin's DuckDB oracle at
    // sf0.01; this pins the same equality in CI at sf0.001, est included
    val batch = graft.operators.Dedup.nearDuplicatePairs(
      graft.operators.Dedup.withPlantedDups(graft.Tables(spark, sfDir).documents),
      "doc_id", "text", 0.5)
      .select("a", "b", "est_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = StreamingQueries.streamNeardupTwin.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream/batch divergence: missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
  }

  test("E7: bucket cap engaged — stream still equals batch, output admission-gated") {
    // The sf10 soak caught the pre-r11 operator emitting 13.5M extra rows
    // once buckets passed MaxBucket: over-cap arrivals were screened
    // against retained entries (pairs the batch path never generates, and
    // 64 pairs per arrival forever from one spam bucket). This pins the
    // fixed contract on a bucket that actually overflows: 66 identical
    // docs → every band-bucket holds all 66, the cap retains the 64
    // smallest, and BOTH sides must emit exactly the pairs among those 64.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog and keeps on running " +
      "through the quiet field toward the river bank before sunset tonight"
    val n = graft.operators.Dedup.MaxBucket + 2
    val base = 1700000000000L
    val input = MemoryStream[DocIn]
    val q = nearDupCandidates(input.toDS(), threshold = 0.5)
      .writeStream.format("memory").queryName("e7_cap").outputMode("append").start()
    try {
      // ascending arrival split across two micro-batches, overflow in batch 2
      input.addData((1 to n - 6).map(i =>
        DocIn(i.toLong, new java.sql.Timestamp(base + i), text)))
      q.processAllAvailable()
      input.addData((n - 5 to n).map(i =>
        DocIn(i.toLong, new java.sql.Timestamp(base + 60000L + i), text)))
      q.processAllAvailable()
      val streamed = spark.table("e7_cap").as[DupCandidate].collect()
        .map(c => (c.a, c.b, c.est_jaccard)).distinct.toSet
      val batch = graft.operators.Dedup.nearDuplicatePairs(
        (1 to n).map(i => (i.toLong, text)).toDF("doc_id", "text"),
        "doc_id", "text", 0.5)
        .select("a", "b", "est_jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val k = graft.operators.Dedup.MaxBucket
      assert(batch.size == k * (k - 1) / 2, s"batch should cap at C($k,2), got ${batch.size}")
      assert(streamed == batch,
        s"cap-engaged divergence: missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
      assert(!streamed.exists(p => p._1 > k || p._2 > k),
        "over-cap arrivals must not appear in any emitted pair")
    } finally q.stop()
  }

  test("E7: streaming near-dup detection finds a planted duplicate across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps on running " +
      "through the quiet field toward the river bank before sunset tonight"
    val input = MemoryStream[DocIn]
    val q = nearDupCandidates(input.toDS(), threshold = 0.5)
      .writeStream.format("memory").queryName("e7_out").outputMode("append").start()
    try {
      // batch 1: the original plus an unrelated doc
      input.addData(
        DocIn(1L, ts(0), base),
        DocIn(3L, ts(1), "completely different content with no overlap whatsoever " +
          "because every token here is from another domain entirely"))
      q.processAllAvailable()
      assert(spark.table("e7_out").count() == 0) // nothing similar yet
      // batch 2: a near-duplicate of doc 1 arrives LATER — the bucket state
      // must remember doc 1 across micro-batches
      input.addData(DocIn(2L, ts(5), base + " near duplicate copy"))
      q.processAllAvailable()
      val pairs = spark.table("e7_out").as[DupCandidate].collect()
        .map(c => (c.a, c.b, c.est_jaccard)).distinct
      assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
        s"expected exactly the planted pair, got ${pairs.mkString(",")}")
      assert(pairs.head._3 >= 0.5)
      // est must equal the batch pipeline's estimate for the same texts
      val batchEst = Seq((1L, base), (2L, base + " near duplicate copy"))
        .toDF("doc_id", "text")
        .select(graft.operators.Dedup.minhashSignature(
          graft.operators.Dedup.shingleHashes(col("text"))).as("sig"))
        .collect().map(_.getSeq[Long](0))
      val expected = batchEst(0).zip(batchEst(1)).count { case (x, y) => x == y } / 64.0
      assert(pairs.head._3 == expected, "streaming estimate must match batch signatures")
    } finally q.stop()
  }

  test("E17: online SemDeDup eliminates across micro-batches; witnesses are lower ids only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val e1 = Seq(1.0f, 0.0f, 0.0f)        // cluster 7's first member
    val e1dup = Seq(1.0f, 0.0f, 0.0f)     // exact copy, cos = 1
    val far = Seq(0.0f, 1.0f, 0.0f)       // same cluster, cos = 0
    val input = MemoryStream[VecIn]
    val q = semanticDedupStream(input.toDS()).toDF()
      .writeStream.format("memory").queryName("e17_out").outputMode("append").start()
    try {
      // batch 1: ids 10 and 20 (distinct directions — no elimination)
      input.addData(VecIn(10L, ts(0), 7, e1), VecIn(20L, ts(1), 7, far))
      q.processAllAvailable()
      assert(spark.table("e17_out").count() == 0)
      // batch 2: id 30 duplicates id 10 from batch 1 — the cross-batch
      // seen-set must produce the elimination with the LOWEST witness
      input.addData(VecIn(30L, ts(2), 7, e1dup))
      q.processAllAvailable()
      val out1 = spark.table("e17_out")
        .select("vec_id", "dup_of", "cluster").as[(Long, Long, Long)].collect()
      assert(out1.toSeq == Seq((30L, 10L, 7L)))
      // batch 3: id 5 duplicates id 10 but has a LOWER id — never
      // eliminated by a later arrival (the monotone-witness contract)
      input.addData(VecIn(5L, ts(3), 7, e1dup))
      q.processAllAvailable()
      assert(spark.table("e17_out").count() == 1)
      // batch 4: id 40 now has three witnesses (5, 10, 30) — min wins
      input.addData(VecIn(40L, ts(4), 7, e1dup))
      q.processAllAvailable()
      val out2 = spark.table("e17_out").filter(col("vec_id") === 40L)
        .select("dup_of").as[Long].collect()
      assert(out2.toSeq == Seq(5L))
    } finally q.stop()
  }

  test("E17: per-cluster cap bounds state; retained members keep correct witnesses") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val e1 = Seq(1.0f, 0.0f, 0.0f)
    val far = Seq(0.0f, 1.0f, 0.0f)
    val input = MemoryStream[VecIn]
    // cap = 2: the cluster retains only its first two arrivals as
    // potential witnesses
    val q = semanticDedupStream(input.toDS(), maxPerCluster = 2).toDF()
      .writeStream.format("memory").queryName("e17_cap").outputMode("append").start()
    try {
      // batch 1: ids 10 (e1) and 20 (far) fill the cap
      input.addData(VecIn(10L, ts(0), 7, e1), VecIn(20L, ts(1), 7, far))
      q.processAllAvailable()
      assert(spark.table("e17_cap").count() == 0)
      // batch 2: id 30 duplicates RETAINED id 10 — over-cap arrivals
      // still screen against the retained set and emit correctly
      input.addData(VecIn(30L, ts(2), 7, e1))
      q.processAllAvailable()
      assert(spark.table("e17_cap")
        .select("vec_id", "dup_of", "cluster").as[(Long, Long, Long)]
        .collect().toSeq == Seq((30L, 10L, 7L)))
      // batch 3: id 35 brings a NEW direction — no retained match, and
      // over the cap it is NOT added to the seen-set
      val newDir = Seq(0.0f, 0.0f, 1.0f)
      input.addData(VecIn(35L, ts(3), 7, newDir))
      q.processAllAvailable()
      assert(spark.table("e17_cap").count() == 1)
      // the documented completeness trade: id 50 duplicates UNRETAINED
      // id 35 — an uncapped run would emit (50, 35); the capped run
      // cannot (only over-cap-vs-over-cap pairs are lost)
      input.addData(VecIn(50L, ts(4), 7, newDir))
      q.processAllAvailable()
      assert(spark.table("e17_cap").count() == 1)
      // batch 5: id 40 duplicates retained id 10 — retained members'
      // witness sets are unaffected by the cap, min retained id wins
      input.addData(VecIn(40L, ts(5), 7, e1))
      q.processAllAvailable()
      assert(spark.table("e17_cap").filter(col("vec_id") === 40L)
        .select("dup_of").as[Long].collect().toSeq == Seq(10L))
    } finally q.stop()
  }

  test("sinkAppId: cosmetic checkpoint respellings share one appId (replay guard identity)") {
    // the appId IS the exactly-once guard's identity: a restart that spells
    // the same checkpoint lineage differently must not mint a new one
    val base = "/tmp/graft_ck/q1"
    val canonical = EventStreams.sinkAppId("ns", "t", base)
    assert(EventStreams.sinkAppId("ns", "t", base + "/") == canonical)
    assert(EventStreams.sinkAppId("ns", "t", "/tmp//graft_ck/q1") == canonical)
    assert(EventStreams.sinkAppId("ns", "t", "/tmp/graft_ck/./q1") == canonical)
    assert(EventStreams.sinkAppId("ns", "t", s"file:$base") == canonical)
    assert(EventStreams.sinkAppId("ns", "t", s"file://$base") == canonical)
    // a RELATIVE spelling resolves against the working directory — same
    // lineage as its absolute spelling from that directory
    val cwd = new java.io.File(".").getAbsoluteFile.getParentFile.getPath
    assert(EventStreams.sinkAppId("ns", "t", "ck/q2") ==
      EventStreams.sinkAppId("ns", "t", s"$cwd/ck/q2"))
    // DIFFERENT lineages keep different ids
    assert(EventStreams.sinkAppId("ns", "t", "/tmp/graft_ck/q2") != canonical)
    assert(EventStreams.sinkAppId("ns", "t", "s3a://bucket-a/ck") !=
      EventStreams.sinkAppId("ns", "t", "s3a://bucket-b/ck"))
    // and non-file schemes still normalize their PATH component
    assert(EventStreams.sinkAppId("ns", "t", "s3a://bucket-a/ck/") ==
      EventStreams.sinkAppId("ns", "t", "s3a://bucket-a/ck"))
  }
}
