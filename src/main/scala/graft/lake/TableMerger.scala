package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Merge strategies for landing staged data into existing lake tables —
  * the reference's TableMerger (/root/reference/utils/merge_utils.py:8-75)
  * re-expressed Spark-first:
  *
  *   1. key found + target exists   → MERGE (upsert): update all columns of
  *      matched rows, insert unmatched — `WHEN MATCHED UPDATE SET * / WHEN
  *      NOT MATCHED INSERT *` semantics.
  *   2. target exists, no key       → INSERT OVERWRITE.
  *   3. target missing              → CREATE TABLE AS SELECT.
  *
  * The upsert is copy-on-write: `target ANTI-JOIN source  UNION BY NAME
  * source`. The anti-join shuffles both sides by the key once; with AQE on,
  * a small source side broadcasts automatically, so at 100 TB the common
  * "small delta into big table" case never shuffles the big table. (A
  * production system prunes rewrite scope to affected partitions; here the
  * snapshot granularity is the whole table, like reference's overwrite.)
  */
final class TableMerger(catalog: LakeCatalog) {

  /** Reference's auto-detection list (merge_utils.py:13). */
  val keyCandidates: Seq[String] = Seq("id", "product_id", "sku", "code", "_id")

  def findKeyColumn(df: DataFrame): Option[String] =
    keyCandidates.find(df.columns.contains)

  final case class MergeResult(strategy: String, sourceRows: Long, finalRows: Long)

  /** One row per key, chosen deterministically: rank by the orderable
    * non-key columns (descending, nulls last) so the same source frame
    * always yields the same winner regardless of partition order. Frames
    * whose non-key columns are all unorderable (maps) fall back to
    * dropDuplicates. No-op shuffle-wise when keys are already unique —
    * the window shares the anti-join's hash partitioning on the key.
    */
  private def dedupeOnKey(src: DataFrame, k: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orderable = src.schema.fields
      .filter(f => f.name != k &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
      .map(f => col(f.name).desc_nulls_last)
    if (orderable.isEmpty) src.dropDuplicates(Seq(k))
    else {
      val w = Window.partitionBy(col(k)).orderBy(orderable.toSeq: _*)
      src.withColumn("__graft_rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("__graft_rn") === 1).drop("__graft_rn")
    }
  }

  def mergeTable(
      src: DataFrame,
      ns: String,
      table: String,
      key: Option[String] = None): MergeResult = {
    val sourceRows = src.count()
    val keyCol = key.orElse(findKeyColumn(src))
    val targetExists = catalog.tableExists(ns, table)

    val strategy = (keyCol, targetExists) match {
      case (Some(k), true) =>
        val target = catalog.read(ns, table)
        // MERGE INTO updates a matched target row ONCE (and the reference's
        // engine errors on multiple source matches) — so a source carrying
        // duplicate key values must collapse to one row per key first, or
        // the anti-join+union would silently keep every duplicate. Pick the
        // winner deterministically (max over the orderable non-key columns)
        // rather than dropDuplicates' partition-order lottery.
        val deduped = dedupeOnKey(src, k)
        val kept = target.join(deduped.select(col(k)), Seq(k), "left_anti")
        val merged = kept.unionByName(deduped, allowMissingColumns = true)
        catalog.write(ns, table, merged, SaveMode.Overwrite)
        s"MERGE (upsert) using key `$k`"
      case (None, true) =>
        catalog.write(ns, table, src, SaveMode.Overwrite)
        "INSERT OVERWRITE (replacing all data)"
      case (k, false) =>
        catalog.write(ns, table, src, SaveMode.Overwrite)
        "CREATE TABLE AS SELECT" +
          k.map(kk => s" (Key `$kk` available for future merges)").getOrElse("")
    }
    MergeResult(strategy, sourceRows, catalog.rowCount(ns, table))
  }
}
