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
        val kept = target.join(src.select(col(k)), Seq(k), "left_anti")
        val merged = kept.unionByName(src, allowMissingColumns = true)
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
