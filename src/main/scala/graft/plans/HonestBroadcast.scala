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
  *     honestBytes = exactRows x (fixed-width attrs at defaultSize
  *                                + variable-width attrs at the footer's
  *                                  total_uncompressed_size / rows
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
            if (canBuild && provenSmall(side, threshold)) {
              // observable decision: scale soaks must be able to SEE what
              // was footer-proven, not infer it from plan diffs
              org.slf4j.LoggerFactory.getLogger(getClass).info(
                s"honest-broadcast: proven small under $threshold B -> " +
                  s"BROADCAST hint on ${side.nodeName} " +
                  side.output.map(_.name).mkString("(", ",", ")"))
              Some(HintInfo(strategy = Some(BROADCAST)))
            } else None
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
    * exact footer statistics bound the in-memory build size under
    * `threshold` — honest in BOTH dimensions: rows are the footer's exact
    * record count, and variable-width columns (strings, binaries, nested)
    * are costed from the footer's per-column EXPANDED byte bound
    * ([[graft.sources.ParquetMeta.columnStatsOfFiles]]: SizeStatistics
    * unencoded bytes when written, valueCount×width for fixed primitives,
    * `total_uncompressed_size` only for dictionary-free chunks) instead of
    * a fixed per-type default (defaultSize counts every string at 20 bytes
    * — a 400k-row dim of KB-sized strings would pass a 32 MB "proof" yet
    * build a multi-hundred-MB hash relation). Fixed-width columns keep
    * defaultSize, which is exact for them. A variable-width output column
    * that cannot be traced to a scan column (a computed expression — its
    * width is unbounded by the scan), or whose chunks the footer cannot
    * prove (dictionary-encoded with no size statistics — the ADVICE r12
    * repetitive-wide-string hole), disqualifies the side: not provable, so
    * it stays with the static/AQE policy.
    */
  private def provenSmall(side: LogicalPlan, threshold: Long): Boolean = {
    if (side.isStreaming) return false
    // estimate pre-filter: footers are cheap but not free — don't even
    // list them for a side whose (already optimistic) estimate is huge
    if (side.stats.sizeInBytes > BigInt(32L) * threshold) return false
    scanOf(side).exists { rel =>
      HonestBroadcastRule.exactStats(spark, rel).exists { case (rows, colBytes) =>
        rows == 0L || {
          val perRow = side.output.map { a =>
            if (isFixedWidth(a.dataType)) Some(a.dataType.defaultSize.toLong)
            else originName(side, a).flatMap(colBytes.get)
              // ceiling division (an integer floor would shave a byte/row)
              // +8: UnsafeRow's offset-and-size word per variable field
              .map(total => (total + rows - 1) / rows + 8L)
          }
          perRow.forall(_.isDefined) &&
            rows * (perRow.flatten.sum + RowOverhead) <= threshold
        }
      }
    }
  }

  private def isFixedWidth(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | DateType | TimestampType |
           TimestampNTZType | NullType => true
      case _: DecimalType => true
      case _ => false
    }
  }

  /** The SCAN column an output attribute reads verbatim, traced through
    * Project aliases/Filters down to the relation — None for computed
    * expressions (their width isn't bounded by any footer column).
    */
  private def originName(p: LogicalPlan,
      attr: org.apache.spark.sql.catalyst.expressions.Attribute): Option[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    p match {
      case Project(projList, child) =>
        projList.find(_.exprId == attr.exprId).flatMap {
          case a: AttributeReference => originName(child, a)
          case Alias(ref: AttributeReference, _) => originName(child, ref)
          case _ => None
        }
      case Filter(_, child) => originName(child, attr)
      case SubqueryAlias(_, child) => originName(child, attr)
      case lr: LogicalRelation =>
        lr.output.find(_.exprId == attr.exprId).map(_.name)
      case _ => None
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
  // footer stats keyed by the scan's file list (immutable once written;
  // testdata and lake commits never mutate in place)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], (Long, Map[String, Long])]()

  private def exactStats(spark: SparkSession,
      rel: HadoopFsRelation): Option[(Long, Map[String, Long])] = {
    val files = rel.location.inputFiles.toIndexedSeq
    if (files.isEmpty) return Some((0L, Map.empty))
    try Some(cache.computeIfAbsent(files,
      _ => graft.sources.ParquetMeta.columnStatsOfFiles(spark, files)))
    catch { case _: Exception => None } // unreadable footer: not proven
  }

  /** Test seam: number of cached footer counts. */
  private[graft] def cacheSize: Int = cache.size
}
