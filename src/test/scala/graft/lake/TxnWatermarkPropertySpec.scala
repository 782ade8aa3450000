package graft.lake

import java.nio.file.Files

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property pins for the idempotent-append txn watermark (B39): under
  * ARBITRARY interleavings of appends, replays, stale re-sends, per-app
  * interleaving and maintenance, the table must hold each applied batch's
  * rows EXACTLY once and every app's watermark must equal the highest
  * batch id it ever committed.
  */
class TxnWatermarkPropertySpec extends SparkSpec {

  private sealed trait Op
  private case class Append(app: Int, batchId: Long) extends Op
  private case object Compact extends Op

  // small op alphabet, deliberately replay-heavy: batch ids are drawn from
  // a tiny range so duplicates and stale re-sends are the COMMON case
  private val opGen: Gen[Op] = Gen.frequency(
    8 -> (for {
      app <- Gen.choose(0, 1)
      b <- Gen.choose(0L, 4L)
    } yield Append(app, b)),
    1 -> Gen.const(Compact))

  test("any interleaving applies each (app, batch) at most once, watermarks monotone") {
    import spark.implicits._
    val prop = Prop.forAll(Gen.listOfN(12, opGen)) { ops =>
      val root = Files.createTempDirectory("graft_txn_prop_")
      try {
        val cat = LakeCatalog(spark, root.resolve("lake").toString)
        // the model: per app, the set of batch ids ACTUALLY applied — an
        // append applies iff its id exceeds the app's running watermark
        val applied = Array.fill(2)(scala.collection.mutable.Set.empty[Long])
        val mark = Array.fill(2)(-1L)
        def frame(app: Int, b: Long) =
          // rows are tagged by (app, batch) so double-application is
          // visible in the data, not just in counts
          (0 until 5).map(i => (app, b, i.toLong)).toDF("app", "batch", "i")
        var hasData = false
        val stepsOk = ops.forall {
          case Append(app, b) =>
            val res = cat.writeTxn("p", "t", s"app$app", b, frame(app, b))
            val expectApplied = b > mark(app)
            if (expectApplied) { applied(app) += b; mark(app) = b; hasData = true }
            res.isDefined == expectApplied
          case Compact =>
            if (hasData) cat.compact("p", "t")
            true
        }
        val finalOk = !hasData || {
          val rows = cat.read("p", "t")
            .groupBy("app", "batch").count().collect()
            .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
          val expect = (for {
            app <- 0 to 1; b <- applied(app)
          } yield (app, b) -> 5L).toMap
          val marksOk = (0 to 1).forall { app =>
            cat.txnVersion("p", "t", s"app$app") ==
              (if (mark(app) >= 0) Some(mark(app)) else None)
          }
          rows == expect && marksOk
        }
        stepsOk && finalOk
      } finally {
        import scala.jdk.CollectionConverters._
        Files.walk(root).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, r.status.toString)
  }
}
