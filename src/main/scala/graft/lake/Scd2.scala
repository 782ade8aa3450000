package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 maintenance over a lake table — the
  * standard warehouse pattern for keeping full attribute history: each key
  * carries one CURRENT row plus closed historical rows bounded by
  * [valid_from, valid_to) snapshot versions.
  *
  * Scale: one full-outer join per applied snapshot, shuffling on the
  * dimension key; with AQE a small delta snapshot broadcasts. History grows
  * append-only (closed rows never rewritten logically), and the whole apply
  * is a single declarative plan — no per-row driver logic.
  */
object Scd2 {

  val ValidFrom = "valid_from"
  val ValidTo = "valid_to"
  val IsCurrent = "is_current"

  /** Apply dimension snapshot `src` (key + attribute columns) as `version`:
    *  - new key                    → insert (valid_from=version, current)
    *  - key present, attrs equal   → keep existing current row
    *  - key present, attrs changed → close old row (valid_to=version) and
    *                                 insert the new values as current
    *  - key absent from snapshot   → keep current row (dimension deletions
    *                                 are represented upstream, not inferred)
    */
  def applySnapshot(
      catalog: LakeCatalog,
      ns: String,
      table: String,
      src: DataFrame,
      key: String,
      version: Int): Unit = {
    val attrs = src.columns.filterNot(_ == key).toSeq
    // a snapshot carrying duplicate key values must collapse to one row per
    // key first (same MERGE-INTO hazard TableMerger.dedupeOnKey guards):
    // a duplicated key would otherwise fan the current row out and insert
    // multiple is_current rows — permanent history corruption.
    val snap = dedupeOnKey(src, key, attrs)
    if (!catalog.tableExists(ns, table)) {
      catalog.write(ns, table, snap
        .withColumn(ValidFrom, lit(version))
        .withColumn(ValidTo, lit(null).cast("int"))
        .withColumn(IsCurrent, lit(true)))
      return
    }
    val hist = catalog.read(ns, table)
    val closed = hist.filter(!col(IsCurrent))
    val cur = hist.filter(col(IsCurrent)).withColumn("_cur_present", lit(true))
    val srcR = snap.select(
      col(key) +: attrs.map(a => col(a).as(s"_src_$a")) :+ lit(true).as("_src_present"): _*)
    val j = cur.join(srcR, Seq(key), "full_outer")
    val changed: Column =
      if (attrs.isEmpty) lit(false) // key-only dimension: nothing can change
      else col("_cur_present") && col("_src_present") &&
        attrs.map(a => !(col(a) <=> col(s"_src_$a"))).reduce(_ || _)
    val keptCurrent = j
      .filter(col("_cur_present") && (col("_src_present").isNull || !changed))
      .select(hist.columns.map(col): _*)
    val closedNow = j.filter(changed)
      .select(col(key) +: attrs.map(col) :+ col(ValidFrom) :+
        lit(version).as(ValidTo) :+ lit(false).as(IsCurrent): _*)
    val inserts = j
      .filter(col("_src_present") && (col("_cur_present").isNull || changed))
      .select(col(key) +: attrs.map(a => col(s"_src_$a").as(a)) :+
        lit(version).as(ValidFrom) :+ lit(null).cast("int").as(ValidTo) :+
        lit(true).as(IsCurrent): _*)
    catalog.write(ns, table,
      closed.unionByName(keptCurrent).unionByName(closedNow).unionByName(inserts))
  }

  /** One row per key, chosen deterministically (desc over the orderable
    * attribute columns) — mirrors TableMerger's MERGE-source dedupe.
    */
  private def dedupeOnKey(src: DataFrame, key: String, attrs: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orderable = attrs
      .filter(a => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(src.schema(a).dataType))
      .map(a => col(a).desc_nulls_last)
    if (orderable.isEmpty) src.dropDuplicates(Seq(key))
    else {
      val w = Window.partitionBy(col(key)).orderBy(orderable: _*)
      src.withColumn("__graft_rn", row_number().over(w))
        .filter(col("__graft_rn") === 1).drop("__graft_rn")
    }
  }
}
