package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** HONEST-STATISTICS broadcast planning (SURVEY §2 C-layer plan quality).
  *
  * Spark's static broadcast decision runs on SIZE ESTIMATES: file bytes
  * scaled by the pruned-column fraction. For compressed key columns the
  * estimate under-counts the in-memory hash relation brutally — at the
  * sf10 soak a 15M-row single-column orders side estimated ~35 MB and the
  * old 64 MB threshold broadcast it (driver built a 15M-entry hash
  * relation; q22 ran 47 s). The r10 fix dropped the static threshold to
  * 1 MB and let AQE recover dim broadcasts from ACTUAL shuffle bytes —
  * scale-safe, but every dim join now materializes a shuffle stage first
  * (the measured 1.4-2x sf0.1 cost on the join-heavy q* family).
  *
  * This rule recovers the stage-free broadcast for relations whose
  * smallness is PROVEN, not estimated: a join side that is a pure
  * Project/Filter over one parquet scan has an EXACT row count in its
  * parquet footers (metadata-only, cached), and
  *
  *     honestBytes = exactRows x (sum of output-attribute defaultSizes
  *                                + per-entry hash-relation overhead)
  *
  * is an overcount-safe in-memory bound (filters only shrink it). Sides
  * whose honest bytes fit [[thresholdBytes]] get a BROADCAST join hint —
  * the same mechanism as a user's `broadcast()` — so the 100 TB guardrail
  * is untouched: a fact side can never qualify, because its EXACT row
  * count disqualifies it no matter what the byte estimate claims, and
  * anything this rule cannot prove small (joins, aggregates, non-parquet
  * sources, missing footers) is left to the 1 MB-static + 32 MB-AQE
  * policy.
  *
  * Config: `spark.graft.honestBroadcast.threshold` (bytes; default 32 MB —
  * the AQE tier's bound), `-1` disables the rule. Footer row counts are
  * cached per file list; the estimate pre-filter skips footer I/O for
  * sides whose own estimate already exceeds 32x the threshold.
  */
case class HonestBroadcastRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def thresholdBytes: Long =
    spark.conf.getOption("spark.graft.honestBroadcast.threshold")
      .map(_.toLong).getOrElse(32L * 1024 * 1024)

  /** Per-entry overhead of the broadcast hash relation beyond the row
    * payload (UnsafeRow header + map entry + pointer slack).
    */
  private val RowOverhead = 48L

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = thresholdBytes
    if (threshold < 0) return plan
    plan.transform {
      case j @ Join(left, right, joinType, _, hint) =>
        def hintFor(side: LogicalPlan, existing: Option[HintInfo],
            canBuild: Boolean): Option[HintInfo] =
          existing.orElse {
            if (canBuild && provenSmall(side, threshold))
              Some(HintInfo(strategy = Some(BROADCAST)))
            else None
          }
        val lh = hintFor(left, hint.leftHint, canBuildLeft(joinType))
        val rh = hintFor(right, hint.rightHint, canBuildRight(joinType))
        if (lh == hint.leftHint && rh == hint.rightHint) j
        else j.copy(hint = JoinHint(lh, rh))
    }
  }

  // which side a physical broadcast join may build, by join type — mirrors
  // Spark's JoinSelection (hinting an unbuildable side would only log a
  // hint-not-honored warning, but don't create the noise)
  private def canBuildLeft(jt: JoinType): Boolean = jt match {
    case _: InnerLike | RightOuter => true
    case _ => false
  }
  private def canBuildRight(jt: JoinType): Boolean = jt match {
    case _: InnerLike | LeftOuter | LeftSemi | LeftAnti | _: ExistenceJoin => true
    case _ => false
  }

  /** True iff `side` is a Project/Filter tree over ONE parquet scan whose
    * exact footer row count bounds the in-memory build size under
    * `threshold`.
    */
  private def provenSmall(side: LogicalPlan, threshold: Long): Boolean = {
    if (side.isStreaming) return false
    // estimate pre-filter: footers are cheap but not free — don't even
    // list them for a side whose (already optimistic) estimate is huge
    if (side.stats.sizeInBytes > BigInt(32L) * threshold) return false
    scanOf(side).exists { rel =>
      HonestBroadcastRule.exactRows(spark, rel).exists { rows =>
        val rowBytes = side.output.map(_.dataType.defaultSize.toLong).sum + RowOverhead
        rows * rowBytes <= threshold
      }
    }
  }

  /** The single parquet scan under row-preserving/row-reducing nodes, or
    * None (a Join/Aggregate/Generate/Union side could exceed its scan's
    * row count, so only Project/Filter/aliases qualify).
    */
  private def scanOf(p: LogicalPlan): Option[HadoopFsRelation] = p match {
    case Project(_, child) => scanOf(child)
    case Filter(_, child) => scanOf(child)
    case SubqueryAlias(_, child) => scanOf(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation
          if fs.fileFormat.toString.toLowerCase.contains("parquet") =>
        // a BUCKETED table is a deliberate physical design: its owner
        // pre-paid the shuffle to get exchange-free co-located joins at
        // every scale — a broadcast hint would discard the bucketing
        // (and the spec-pinned plan) for a small-SF-only win
        if (fs.bucketSpec.isDefined) None else Some(fs)
      case _ => None
    }
    case _ => None
  }
}

object HonestBroadcastRule {
  // footer row counts keyed by the scan's file list (immutable once
  // written; testdata and lake commits never mutate in place)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], Long]()

  private def exactRows(spark: SparkSession, rel: HadoopFsRelation): Option[Long] = {
    val files = rel.location.inputFiles.toIndexedSeq
    if (files.isEmpty) return Some(0L)
    try Some(cache.computeIfAbsent(files,
      _ => graft.sources.ParquetMeta.rowCountOfFiles(spark, files)))
    catch { case _: Exception => None } // unreadable footer: not proven
  }

  /** Test seam: number of cached footer counts. */
  private[graft] def cacheSize: Int = cache.size
}
