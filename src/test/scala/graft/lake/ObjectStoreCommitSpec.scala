package graft.lake

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SaveMode

/** Pins the commit protocol's guarantee matrix on OBJECT-STORE semantics
  * (ObjectStoreSimBackend: no exclusive create, no atomic rename, strong
  * listing — i.e. post-2020 S3 without conditional put), and shows exactly
  * which guarantee needs a conditional-put catalog service.
  *
  * Summary the sim proves:
  *  - the full snapshot lifecycle and BOTH sequential-conflict guards
  *    (stale expectedVersion, append lost-update CAS) hold on a plain
  *    object store — they only need strong read-after-write listing;
  *  - a rival writer interleaved into the non-atomic CLAIM window is still
  *    caught, at publish, by the exists-check (strong consistency narrows
  *    the race to the final copy);
  *  - the PUBLISH window itself is the one unguardable step: two writers
  *    both past the exists-check double-publish and the later copy
  *    silently wins — THIS is what S3 `If-None-Match` / an Iceberg
  *    REST-catalog commit endpoint must arbitrate (conditionalPut = true
  *    turns the same interleaving into a clean reject).
  */
class ObjectStoreCommitSpec extends SparkSpec {

  private def simCatalog(conditionalPut: Boolean): (LakeCatalog, ObjectStoreSimBackend) = {
    val root = Files.createTempDirectory("graft_s3sim").toString
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val sim = new ObjectStoreSimBackend(fs, conditionalPut)
    (LakeCatalog(spark, root, Some(sim)), sim)
  }

  test("plain object store: full snapshot lifecycle + sequential CAS guards hold") {
    val (cat, _) = simCatalog(conditionalPut = false)
    import spark.implicits._
    cat.write("ns", "t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    cat.write("ns", "t", Seq((3, "c")).toDF("id", "v"), SaveMode.Append)
    assert(cat.versions("ns", "t") == Seq(1, 2))
    assert(cat.rowCount("ns", "t") == 3)
    assert(cat.read("ns", "t", Some(1)).count() == 2) // time travel
    // stale expectedVersion loses (two-writer conflict, sequential)
    val e = intercept[CommitConflictException] {
      cat.write("ns", "t", Seq(9).toDF("id"), SaveMode.Append, expectedVersion = Some(1))
    }
    assert(e.getMessage.contains("moved to v2"))
    // append lost-update CAS: appends pin the version they extended
    cat.write("ns", "t", Seq((4, "d")).toDF("id", "v"), SaveMode.Append)
    assert(cat.versions("ns", "t") == Seq(1, 2, 3))
    assert(cat.read("ns", "t").count() == 4)
    // file-scoped delete + merge run unchanged through the sim
    cat.delete("ns", "t", org.apache.spark.sql.functions.col("id") === 3)
    assert(cat.read("ns", "t").count() == 3)
    val merger = new TableMerger(cat)
    merger.mergeTable(Seq((1, "A"), (5, "e")).toDF("id", "v"), "ns", "t")
    assert(cat.read("ns", "t").filter("id = 1 AND v = 'A'").count() == 1)
    assert(cat.rowCount("ns", "t") == 4)
  }

  test("claim-window race: strong listing still catches the straggler at publish") {
    val (cat, sim) = simCatalog(conditionalPut = false)
    import spark.implicits._
    cat.write("ns", "t", Seq(1).toDF("id")) // v1
    // rival writer commits v2 INSIDE this writer's check-then-create gap
    var fired = false
    sim.interleaveOnClaim = () => if (!fired) {
      fired = true
      cat.write("ns", "t", Seq(2).toDF("id"), SaveMode.Append)
    }
    // the interleaved writer won v2; this writer must conflict, not clobber
    val e = intercept[CommitConflictException] {
      cat.write("ns", "t", Seq(3).toDF("id"), SaveMode.Append, expectedVersion = Some(1))
    }
    assert(e.getMessage.contains("v2"), e.getMessage)
    assert(cat.read("ns", "t").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("publish window DOUBLE-PUBLISH: silent overwrite without conditional put") {
    // the one step strong consistency cannot guard: both writers are past
    // the exists-check on the same target; the later copy wins silently
    val (cat, sim) = simCatalog(conditionalPut = false)
    import spark.implicits._
    cat.write("ns", "t", Seq(1).toDF("id")) // v1
    val dir = new Path(cat.root, "ns/t/manifests")
    val target = new Path(dir, "v00002.txt")
    var fired = false
    sim.interleaveOnPublish = () => if (!fired) {
      fired = true
      // rival already past ITS exists-check: publishes v2 directly
      sim.writeBytes(new Path(dir, ".rival.tmp"),
        "data/rival-commit".getBytes("UTF-8"))
      sim.renameIfAbsent(new Path(dir, ".rival.tmp"), target)
    }
    // this writer's publish overwrites the rival's v2 — the documented
    // object-store hazard: no error anywhere, rival's commit is GONE
    cat.write("ns", "t", Seq(2).toDF("id"), SaveMode.Append)
    val v2 = new String(sim.readBytes(target), "UTF-8")
    assert(!v2.contains("rival-commit"),
      "expected the plain-PUT overwrite hazard: the rival's manifest should have been clobbered")
  }

  test("conditional put turns the same double-publish into a clean reject") {
    val (cat, sim) = simCatalog(conditionalPut = true)
    import spark.implicits._
    cat.write("ns", "t", Seq(1).toDF("id")) // v1
    val dir = new Path(cat.root, "ns/t/manifests")
    val target = new Path(dir, "v00002.txt")
    // rival publishes v2 first (conditional put succeeds, target absent)
    sim.writeBytes(new Path(dir, ".rival.tmp"), "data/rival-commit".getBytes("UTF-8"))
    assert(sim.renameIfAbsent(new Path(dir, ".rival.tmp"), target))
    // this writer staged against v1: CAS sees v2 and rejects — and even a
    // writer that somehow reached publish would get renameIfAbsent=false
    intercept[CommitConflictException] {
      cat.write("ns", "t", Seq(2).toDF("id"), SaveMode.Append, expectedVersion = Some(1))
    }
    assert(new String(sim.readBytes(target), "UTF-8").contains("rival-commit"),
      "rival's manifest must survive intact under conditional put")
  }

  test("concurrent writers on conditional put: exactly one of two appends wins each version") {
    val (cat, _) = simCatalog(conditionalPut = true)
    import spark.implicits._
    cat.write("ns", "t", Seq(0).toDF("id"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val outcomes = (1 to 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = {
            barrier.await()
            try { cat.write("ns", "t", Seq(i * 10).toDF("id"), SaveMode.Append,
              expectedVersion = Some(1)); "win" }
            catch { case _: CommitConflictException => "conflict" }
          }
        })
      }.map(_.get())
      assert(outcomes.sorted == Seq("conflict", "win"), outcomes.toString)
      assert(cat.versions("ns", "t") == Seq(1, 2))
      // the surviving table contains v1 plus exactly the winner's append
      assert(cat.read("ns", "t").count() == 2)
    } finally pool.shutdown()
  }

  test("WAP and MoR deletes run on plain object-store semantics") {
    val (cat, _) = simCatalog(conditionalPut = false)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    cat.write("ns", "t", Seq((1, 10), (2, 20)).toDF("id", "x"))
    // stage → audit-fail → abort leaves nothing; stage → publish lands
    val bad = cat.stageWrite("ns", "t", Seq((3, -1)).toDF("id", "x"), SaveMode.Append)
    assert(cat.readStagedData(bad).filter(col("x") < 0).count() == 1)
    cat.abortStaged(bad)
    val good = cat.stageWrite("ns", "t", Seq((3, 30)).toDF("id", "x"), SaveMode.Append)
    cat.publishStaged(good)
    assert(cat.read("ns", "t").count() == 3)
    // publish CAS still guards the staged base on the object store
    val stale = cat.stageWrite("ns", "t", Seq((4, 40)).toDF("id", "x"), SaveMode.Append)
    cat.write("ns", "t", Seq((5, 50)).toDF("id", "x"), SaveMode.Append)
    intercept[CommitConflictException] { cat.publishStaged(stale) }
    // merge-on-read delete + vectored read + materialize through the sim
    cat.deleteMoR("ns", "t", col("id") === 2)
    assert(cat.read("ns", "t").collect().map(_.getInt(0)).toSet == Set(1, 3, 5))
    cat.materializeDeletes("ns", "t")
    assert(cat.read("ns", "t").collect().map(_.getInt(0)).toSet == Set(1, 3, 5))
    assert(cat.rowCount("ns", "t") == 3)
  }
}
