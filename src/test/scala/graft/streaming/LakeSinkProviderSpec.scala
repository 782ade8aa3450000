package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}

import graft.SparkSpec
import graft.lake.LakeCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The NATIVE `writeStream.format("graft-lake")` sink provider (VERDICT
  * r14 #1): the same exactly-once landing bodies as the foreachBatch
  * helpers (SinkOps), reachable with no code — and therefore from SQL.
  * Pins: all three modes land correctly end-to-end; the kill-between-
  * lake-commit-and-checkpoint-commit replay is a no-op (append) / a skip
  * (upsert); option validation refuses loudly.
  */
class LakeSinkProviderSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  private def frame(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, i * 1.5)).toDF("id", "v")
  }

  private def rmrf(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  private def land(root: Path, src: Path, round: Int, df: DataFrame): Unit = {
    val stage = root.resolve(s"stage_$round")
    df.coalesce(1).write.parquet(stage.toString)
    Files.move(stage, src.resolve(s"r$round"), StandardCopyOption.ATOMIC_MOVE)
  }

  private def dropLastCommit(cp: Path): Long = {
    import scala.jdk.CollectionConverters._
    val commits = cp.resolve("commits")
    val last = Files.list(commits).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit))
      .map(_.toLong).max
    Files.delete(commits.resolve(last.toString))
    Files.deleteIfExists(commits.resolve(s".$last.crc"))
    last
  }

  /** file-source rounds through the PROVIDER sink (no foreachBatch). */
  private def runRounds(
      src: Path, cp: Path, lakeRoot: String, table: String, opts: Map[String, String],
      root: Path, firstRound: Int, frames: Seq[DataFrame]): Unit = {
    frames.headOption.foreach(land(root, src, firstRound, _))
    val stream = spark.readStream.schema(schema).parquet(src.toString + "/*")
    val q = stream.writeStream.format("graft-lake")
      .option("root", lakeRoot).option("table", table)
      .option("checkpointLocation", cp.toString)
      .options(opts)
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      frames.zipWithIndex.drop(1).foreach { case (f, i) =>
        land(root, src, firstRound + i, f); q.processAllAvailable()
      }
    } finally q.stop()
  }

  test("append mode: exactly-once through the provider, incl. kill/replay") {
    val root = Files.createTempDirectory("graft_psink_")
    try {
      val src = root.resolve("src"); Files.createDirectories(src)
      val cp = root.resolve("cp")
      val lakeRoot = root.resolve("lake").toString
      val cat = LakeCatalog(spark, lakeRoot)
      runRounds(src, cp, lakeRoot, "st.pv", Map.empty, root, 0,
        Seq(frame(0 until 50), frame(50 until 80)))
      assert(cat.read("st", "pv").count() == 80)
      val vBefore = cat.versions("st", "pv").last
      // crash window: lake committed batch 1, checkpoint did not
      dropLastCommit(cp)
      runRounds(src, cp, lakeRoot, "st.pv", Map.empty, root, 2,
        Seq(frame(80 until 90)))
      assert(cat.read("st", "pv").count() == 90,
        "replayed micro-batch must be a no-op, new batch must land")
      assert(cat.versions("st", "pv").last == vBefore + 1)
      // provider sink and foreachBatch helper share the SAME appId for the
      // same checkpoint lineage (one replay-guard identity, two spellings)
      val app = SinkOps.appIdFor("st", "pv", cp.toString)
      assert(cat.txnVersion("st", "pv", app).isDefined)
    } finally rmrf(root)
  }

  test("upsert mode: corrections merge in place; replay skips the merge") {
    val root = Files.createTempDirectory("graft_psink_")
    try {
      val src = root.resolve("src"); Files.createDirectories(src)
      val cp = root.resolve("cp")
      val lakeRoot = root.resolve("lake").toString
      val cat = LakeCatalog(spark, lakeRoot)
      runRounds(src, cp, lakeRoot, "st.up", Map("mode" -> "upsert", "key" -> "id"),
        root, 0, Seq(frame(0 until 50), frame(25 until 75)))
      assert(cat.read("st", "up").count() == 75,
        "corrected keys must merge, not append")
      val vBefore = cat.versions("st", "up").last
      dropLastCommit(cp)
      runRounds(src, cp, lakeRoot, "st.up", Map("mode" -> "upsert", "key" -> "id"),
        root, 2, Seq.empty)
      assert(cat.versions("st", "up").last == vBefore,
        "replayed batch must skip the merge entirely")
      assert(cat.read("st", "up").count() == 75)
    } finally rmrf(root)
  }

  test("cdc mode: upserts + tombstones land in one pass per batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_psink_")
    try {
      val src = root.resolve("src"); Files.createDirectories(src)
      val cp = root.resolve("cp")
      val lakeRoot = root.resolve("lake").toString
      val cat = LakeCatalog(spark, lakeRoot)
      val cdcSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", DoubleType),
        StructField("_op", StringType), StructField("ord", LongType)))
      def cdcFrame(rows: Seq[(Long, Double, String, Long)]): DataFrame =
        rows.toDF("id", "v", "_op", "ord")
      def landCdc(round: Int, df: DataFrame): Unit = {
        val stage = root.resolve(s"stage_$round")
        df.coalesce(1).write.parquet(stage.toString)
        Files.move(stage, src.resolve(s"r$round"), StandardCopyOption.ATOMIC_MOVE)
      }
      landCdc(0, cdcFrame((0L until 10L).map(i => (i, i * 1.0, "upsert", 1L))))
      val stream = spark.readStream.schema(cdcSchema).parquet(src.toString + "/*")
      val q = stream.writeStream.format("graft-lake")
        .option("root", lakeRoot).option("table", "st.cdc")
        .option("checkpointLocation", cp.toString)
        .option("mode", "cdc").option("key", "id").option("orderCol", "ord")
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable()
        // batch 2: delete evens, correct id 1, AND an insert-then-delete
        // key (id 100 at ord 2 then 3) that must NOT survive
        landCdc(1, cdcFrame(
          (0L until 10L by 2).map(i => (i, 0.0, "delete", 2L)) ++
            Seq((1L, 99.0, "upsert", 2L), (100L, 1.0, "upsert", 2L),
              (100L, 0.0, "delete", 3L))))
        q.processAllAvailable()
      } finally q.stop()
      val rows = cat.read("st", "cdc").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows == Seq((1L, 99.0), (3L, 3.0), (5L, 5.0), (7L, 7.0), (9L, 9.0)),
        rows.toString)
    } finally rmrf(root)
  }

  test("Update output + upsert mode: a stateful aggregate CONVERGES in the lake (re-emitted groups merge)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val root = Files.createTempDirectory("graft_psink_")
    try {
      val lakeRoot = root.resolve("lake").toString
      val cat = LakeCatalog(spark, lakeRoot)
      val input = MemoryStream[(Long, Long)]
      // running per-key counts, Update mode: each trigger re-emits only
      // the keys whose count changed — the upsert sink must converge the
      // table to the final counts, not stack revisions
      val counts = input.toDS().toDF("k", "x")
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
      val q = counts.writeStream.format("graft-lake")
        .option("root", lakeRoot).option("table", "st.counts")
        .option("checkpointLocation", root.resolve("cp").toString)
        .option("mode", "upsert").option("key", "k")
        .outputMode("update")
        .start()
      try {
        input.addData((1L, 0L), (1L, 0L), (2L, 0L))
        q.processAllAvailable()
        input.addData((1L, 0L), (3L, 0L)) // key 1 re-emits with n=3
        q.processAllAvailable()
      } finally q.stop()
      val rows = cat.read("st", "counts").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((1L, 3L), (2L, 1L), (3L, 1L)),
        s"table must hold the FINAL counts, one row per key: $rows")
    } finally rmrf(root)
  }

  test("upsert mode with a COMPOSITE key merges on the tuple (ADVICE r15)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val root = Files.createTempDirectory("graft_psink_")
    try {
      val lakeRoot = root.resolve("lake").toString
      val cat = LakeCatalog(spark, lakeRoot)
      val input = MemoryStream[(Long, Long, Double)]
      val q = input.toDS().toDF("a", "b", "v").writeStream.format("graft-lake")
        .option("root", lakeRoot).option("table", "st.ck")
        .option("checkpointLocation", root.resolve("cp").toString)
        .option("mode", "upsert").option("key", "a,b")
        .outputMode("append")
        .start()
      try {
        input.addData((1L, 1L, 1.0), (1L, 2L, 2.0), (2L, 1L, 3.0))
        q.processAllAvailable()
        // correction for (1,2) only — (1,1) differs only in the SECOND
        // key column and must survive untouched (pre-r16 the sink merged
        // on keys.head alone and would clobber it)
        input.addData((1L, 2L, 99.0))
        q.processAllAvailable()
      } finally q.stop()
      val rows = cat.read("st", "ck").orderBy("a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq((1L, 1L, 1.0), (1L, 2L, 99.0), (2L, 1L, 3.0)),
        rows.toString)
    } finally rmrf(root)
  }

  test("option validation refuses loudly: checkpoint, mode, key, Complete") {
    val root = Files.createTempDirectory("graft_psink_")
    try {
      val src = root.resolve("src"); Files.createDirectories(src)
      land(root, src, 0, frame(0 until 5))
      val stream = spark.readStream.schema(schema).parquet(src.toString + "/*")
      val lakeRoot = root.resolve("lake").toString
      def start(opts: Map[String, String], cp: Boolean = true) = {
        val w = stream.writeStream.format("graft-lake")
          .option("root", lakeRoot).option("table", "st.bad")
          .options(opts).outputMode("append")
        (if (cp) w.option("checkpointLocation",
          root.resolve("cp" + opts.hashCode).toString) else w).start()
      }
      val e1 = intercept[Exception] { start(Map.empty, cp = false) }
      assert(e1.getMessage.contains("checkpointLocation"), e1.getMessage)
      val e2 = intercept[Exception] { start(Map("mode" -> "sideways")) }
      assert(e2.getMessage.contains("append|upsert|cdc"), e2.getMessage)
      val e3 = intercept[Exception] { start(Map("mode" -> "upsert")) }
      assert(e3.getMessage.contains("key"), e3.getMessage)
      val agg = stream.groupBy(col("id") % 2).count()
      val e4 = intercept[Exception] {
        agg.writeStream.format("graft-lake")
          .option("root", lakeRoot).option("table", "st.bad")
          .option("checkpointLocation", root.resolve("cpc").toString)
          .outputMode("complete").start()
      }
      assert(e4.getMessage.contains("Complete"), e4.getMessage)
      // Update output + plain-append mode would stack every group
      // revision — only the keyed modes converge under re-emission
      val e5 = intercept[Exception] {
        agg.writeStream.format("graft-lake")
          .option("root", lakeRoot).option("table", "st.bad")
          .option("checkpointLocation", root.resolve("cpu").toString)
          .outputMode("update").start()
      }
      assert(e5.getMessage.contains("upsert"), e5.getMessage)
    } finally rmrf(root)
  }
}
