package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) clustering for commit-level data skipping — the
  * Delta `OPTIMIZE ... ZORDER BY` / Iceberg sort-order idea at this lake's
  * pruning granularity.
  *
  * Why: append-by-time commits give tight min/max on the time column only;
  * a band query on any OTHER column prunes nothing. Z-ordering interleaves
  * the bits of several columns' quantile ranks into one sort key, so rows
  * close on the Morton curve are close in EVERY clustered dimension — each
  * commit then covers a compact hyper-rectangle, its min/max sidecar is
  * tight on every clustered column, and [[LakeCatalog.readWhere]] prunes
  * commits for band predicates on ANY of them.
  *
  * Scale shape: quantile boundaries are one approxQuantile pass (driver
  * gets ~15 doubles per column); the Morton key is a pure codegen'd
  * expression; the write is ONE shuffle-free pass partitioned by z-bucket
  * (hive-style subdirs), and every bucket subdir becomes its own manifest
  * entry with footer-derived stats — no per-bucket jobs, no driver loops
  * over data.
  */
object ZOrder {

  val BitsPerCol = 4 // 16 quantile ranks per column

  /** Per-column quantile boundaries (15 internal cut points for 16 ranks).
    * ONE approxQuantile pass covers every column (the multi-column
    * overload); columns must be numeric.
    */
  def boundaries(df: DataFrame, cols: Seq[String]): Seq[Array[Double]] =
    df.stat.approxQuantile(cols.toArray,
      (1 until (1 << BitsPerCol)).map(_.toDouble / (1 << BitsPerCol)).toArray, 0.001)
      .toSeq

  /** Quantile rank (0..15) of `c` against its boundary cut points — a
    * codegen'd when-chain, no UDF.
    */
  private def rank(c: Column, cuts: Array[Double]): Column =
    cuts.foldLeft(lit(0)) { (acc, cut) =>
      acc + when(c >= lit(cut), 1).otherwise(0)
    }

  /** Morton interleave of the columns' quantile ranks: bit i of column j
    * lands at position i * numCols + j. Pure integer expression.
    */
  def mortonKey(cols: Seq[Column], cuts: Seq[Array[Double]]): Column = {
    val n = cols.length
    val ranks = cols.zip(cuts).map { case (c, b) => rank(c.cast("double"), b) }
    (for {
      bit <- 0 until BitsPerCol
      (r, j) <- ranks.zipWithIndex
    } yield shiftleft(shiftright(r, bit).bitwiseAND(lit(1)), bit * n + j))
      .reduce((a, b) => a.bitwiseOR(b))
  }
}
