package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}

import graft.SparkSpec
import graft.lake.LakeCatalog
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exactly-once guarantees of the streaming APPEND sinks (E4/E14/E20/E21)
  * under Structured Streaming's at-least-once foreachBatch contract.
  *
  * The failure these tests reproduce: a crash lands BETWEEN the sink's lake
  * commit and the checkpoint's commit log, so the restarted query re-runs
  * the same batchId and a naive `catalog.write(Append)` lands the same rows
  * twice. The kill is simulated EXACTLY at that boundary by deleting the
  * last entry of `<checkpoint>/commits` after a clean stop — offsets/N
  * exists, commits/N does not, which is precisely the crash window — and
  * restarting on the same checkpoint. A control test proves the harness
  * really replays (a guard-less append sink duplicates).
  */
class IdempotentSinkSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  private def frame(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, i * 1.5)).toDF("id", "v")
  }

  /** Land one atomic drop into the watched dir (stage + rename). */
  private def land(root: Path, src: Path, round: Int, df: DataFrame): Unit = {
    val stage = root.resolve(s"stage_$round")
    df.coalesce(1).write.parquet(stage.toString)
    Files.move(stage, src.resolve(s"r$round"), StandardCopyOption.ATOMIC_MOVE)
  }

  private def rmrf(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  /** Delete `commits/<last>` from the checkpoint — the crash between sink
    * commit and checkpoint commit. Returns the replayed batch id.
    */
  private def dropLastCommit(cp: Path): Long = {
    import scala.jdk.CollectionConverters._
    val commits = cp.resolve("commits")
    val last = Files.list(commits).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit))
      .map(_.toLong).max
    Files.delete(commits.resolve(last.toString))
    // the local checksum FS keeps a .N.crc sidecar; a stale one fails the
    // re-written commit's rename
    Files.deleteIfExists(commits.resolve(s".$last.crc"))
    last
  }

  private def runRounds(
      src: Path, cp: Path,
      start: DataFrame => org.apache.spark.sql.streaming.StreamingQuery,
      root: Path, firstRound: Int, frames: Seq[DataFrame]): Unit = {
    frames.headOption.foreach(land(root, src, firstRound, _))
    val stream = spark.readStream.schema(schema).parquet(src.toString + "/*")
    val q = start(stream)
    try {
      q.processAllAvailable()
      frames.zipWithIndex.drop(1).foreach { case (f, i) =>
        land(root, src, firstRound + i, f); q.processAllAvailable()
      }
    } finally q.stop()
  }

  test("writeTxn: replayed batch id is a no-op; fresh ids commit") {
    val root = Files.createTempDirectory("graft_txn_")
    try {
      val cat = LakeCatalog(spark, root.resolve("lake").toString)
      assert(cat.writeTxn("t", "a", "app1", 0L, frame(0 until 10)).isDefined)
      assert(cat.txnVersion("t", "a", "app1").contains(0L))
      // exact replay: no-op, no new version, no duplicate rows
      assert(cat.writeTxn("t", "a", "app1", 0L, frame(0 until 10)).isEmpty)
      assert(cat.versions("t", "a").size == 1)
      assert(cat.read("t", "a").count() == 10)
      // stale (lower) id: also a no-op
      assert(cat.writeTxn("t", "a", "app1", -1L, frame(0 until 3)).isEmpty)
      // next id commits; an unrelated app has its own watermark
      assert(cat.writeTxn("t", "a", "app1", 1L, frame(10 until 15)).isDefined)
      assert(cat.writeTxn("t", "a", "otherApp", 0L, frame(15 until 18)).isDefined)
      assert(cat.read("t", "a").count() == 18)
      assert(cat.txnVersion("t", "a", "app1").contains(1L))
      assert(cat.txnVersion("t", "a", "otherApp").contains(0L))
    } finally rmrf(root)
  }

  test("txn watermark survives maintenance: compaction, CoW delete, overwrite") {
    val root = Files.createTempDirectory("graft_txn_")
    try {
      val cat = LakeCatalog(spark, root.resolve("lake").toString)
      cat.writeTxn("t", "m", "app", 5L, frame(0 until 100))
      cat.compact("t", "m")
      assert(cat.txnVersion("t", "m", "app").contains(5L),
        "compaction must not reopen the sink's replay window")
      cat.delete("t", "m", col("id") < 10)
      assert(cat.txnVersion("t", "m", "app").contains(5L),
        "file-scoped CoW delete must carry txn lines")
      cat.write("t", "m", frame(200 until 210), SaveMode.Overwrite)
      assert(cat.txnVersion("t", "m", "app").contains(5L),
        "overwrite replaces data, not transaction history")
      // and the replay is still a no-op afterwards
      assert(cat.writeTxn("t", "m", "app", 5L, frame(0 until 100)).isEmpty)
      assert(cat.read("t", "m").count() == 10)
    } finally rmrf(root)
  }

  test("txn lines are invisible to readers, row counts, incremental reads") {
    val root = Files.createTempDirectory("graft_txn_")
    try {
      val cat = LakeCatalog(spark, root.resolve("lake").toString)
      cat.writeTxn("t", "r", "app", 0L, frame(0 until 20))
      val v1 = cat.versions("t", "r").last
      cat.writeTxn("t", "r", "app", 1L, frame(20 until 30))
      val v2 = cat.versions("t", "r").last
      assert(cat.read("t", "r").columns.toSeq == Seq("id", "v"))
      assert(cat.rowCount("t", "r") == 30)
      // the moved txn line must not defeat the append-only metadata fast
      // path of incremental reads
      assert(cat.readAppended("t", "r", v1, v2).count() == 10)
    } finally rmrf(root)
  }

  test("E4/E14 kill between lake commit and checkpoint commit: no duplicates") {
    val root = Files.createTempDirectory("graft_sink_")
    try {
      val src = root.resolve("src"); Files.createDirectories(src)
      val cp = root.resolve("cp")
      val cat = LakeCatalog(spark, root.resolve("lake").toString)
      def start(s: DataFrame) =
        EventStreams.streamIntoLake(s, cat, "st", "ev", cp.toString)
      runRounds(src, cp, start, root, 0, Seq(frame(0 until 50), frame(50 until 80)))
      assert(cat.read("st", "ev").count() == 80)
      val vBefore = cat.versions("st", "ev").last
      // crash window: the lake committed batch 1, the checkpoint did not
      val replayed = dropLastCommit(cp)
      assert(replayed >= 1L)
      // restart on the same checkpoint: Spark re-delivers the batch
      runRounds(src, cp, start, root, 2, Seq(frame(80 until 90)))
      assert(cat.read("st", "ev").count() == 90,
        "replayed micro-batch must be a no-op, new batch must land")
      // the replay published NO new snapshot; only the fresh batch did
      assert(cat.versions("st", "ev").last == vBefore + 1)
    } finally rmrf(root)
  }

  test("control: a guard-less append sink DOES duplicate under the same kill") {
    val root = Files.createTempDirectory("graft_sink_")
    try {
      val src = root.resolve("src"); Files.createDirectories(src)
      val cp = root.resolve("cp")
      val cat = LakeCatalog(spark, root.resolve("lake").toString)
      def start(s: DataFrame) = s.writeStream
        .option("checkpointLocation", cp.toString)
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          cat.write("st", "raw", b.toDF(), SaveMode.Append); ()
        }.start()
      runRounds(src, cp, start, root, 0, Seq(frame(0 until 50), frame(50 until 80)))
      dropLastCommit(cp)
      runRounds(src, cp, start, root, 2, Seq.empty)
      assert(cat.read("st", "raw").count() > 80,
        "harness sanity: the kill really re-delivers the batch " +
          "(if this fails, the idempotence tests above test nothing)")
    } finally rmrf(root)
  }

  test("E21 kill/replay on the branch sink: branch and published main exact") {
    val root = Files.createTempDirectory("graft_sink_")
    try {
      val src = root.resolve("src"); Files.createDirectories(src)
      val cp = root.resolve("cp")
      val cat = LakeCatalog(spark, root.resolve("lake").toString)
      cat.write("st", "ev", frame(0 until 10))
      cat.createBranch("st", "ev", "ingest")
      def start(s: DataFrame) =
        EventStreams.streamIntoBranch(s, cat, "st", "ev", "ingest", cp.toString)
      runRounds(src, cp, start, root, 0, Seq(frame(10 until 40), frame(40 until 60)))
      dropLastCommit(cp)
      runRounds(src, cp, start, root, 2, Seq(frame(60 until 70)))
      assert(cat.readBranch("st", "ev", "ingest").count() == 70)
      // main untouched during the session, exact after the publish
      assert(cat.read("st", "ev").count() == 10)
      cat.fastForwardBranch("st", "ev", "ingest")
      assert(cat.read("st", "ev").count() == 70)
      // the watermark fast-forwarded with the publish: a late replay onto
      // a FRESH branch cut at published main still no-ops
      cat.createBranch("st", "ev", "ingest2")
      val app = EventStreams.sinkAppId("st", "ev", cp.toString)
      assert(cat.writeBranchTxn("st", "ev", "ingest2", app, 2L,
        frame(60 until 70)).isEmpty)
    } finally rmrf(root)
  }

  test("E9 merge sink kill/replay: replayed batch SKIPS the merge (no new version)") {
    val root = Files.createTempDirectory("graft_sink_")
    try {
      val src = root.resolve("src"); Files.createDirectories(src)
      val cp = root.resolve("cp")
      val cat = LakeCatalog(spark, root.resolve("lake").toString)
      def start(s: DataFrame) =
        EventStreams.streamUpsertIntoLake(s, cat, "st", "up", "id", cp.toString)
      // batch 0: ids 0..49; batch 1: corrections for 25..74 (upserts+inserts)
      runRounds(src, cp, start, root, 0,
        Seq(frame(0 until 50), frame(25 until 75)))
      assert(cat.read("st", "up").count() == 75)
      val vBefore = cat.versions("st", "up").last
      dropLastCommit(cp)
      runRounds(src, cp, start, root, 2, Seq.empty)
      // merge WOULD converge anyway; the watermark means the replay did
      // not even publish a version (skip, not re-merge)
      assert(cat.versions("st", "up").last == vBefore,
        "replayed batch must skip the merge entirely")
      assert(cat.read("st", "up").count() == 75)
      // a genuinely new batch still lands
      runRounds(src, cp, start, root, 3, Seq(frame(75 until 90)))
      assert(cat.read("st", "up").count() == 90)
    } finally rmrf(root)
  }

  test("writeBranchTxn: direct replay no-op on the branch lineage") {
    val root = Files.createTempDirectory("graft_txn_")
    try {
      val cat = LakeCatalog(spark, root.resolve("lake").toString)
      cat.write("t", "b", frame(0 until 5))
      cat.createBranch("t", "b", "dev")
      assert(cat.writeBranchTxn("t", "b", "dev", "app", 0L, frame(5 until 9)).isDefined)
      assert(cat.writeBranchTxn("t", "b", "dev", "app", 0L, frame(5 until 9)).isEmpty)
      assert(cat.readBranch("t", "b", "dev").count() == 9)
      assert(cat.read("t", "b").count() == 5)
    } finally rmrf(root)
  }
}
