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
    if (!catalog.tableExists(ns, table)) {
      catalog.write(ns, table, src
        .withColumn(ValidFrom, lit(version))
        .withColumn(ValidTo, lit(null).cast("int"))
        .withColumn(IsCurrent, lit(true)))
      return
    }
    val hist = catalog.read(ns, table)
    val closed = hist.filter(!col(IsCurrent))
    val cur = hist.filter(col(IsCurrent)).withColumn("_cur_present", lit(true))
    val srcR = src.select(
      col(key) +: attrs.map(a => col(a).as(s"_src_$a")) :+ lit(true).as("_src_present"): _*)
    val j = cur.join(srcR, Seq(key), "full_outer")
    val changed: Column = col("_cur_present") && col("_src_present") &&
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
}
