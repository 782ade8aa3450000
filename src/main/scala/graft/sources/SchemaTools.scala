package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Schema hygiene + evolution for heterogeneous file ingestion: the
  * reference ingests "files with unpredictable or varying schemas"
  * (README Overview) — these are the Spark-first tools for that.
  */
object SchemaTools {

  /** Make an arbitrary string a safe SQL/parquet identifier. */
  def sanitizeName(raw: String): String = {
    val cleaned = raw.trim.replaceAll("[^A-Za-z0-9_]", "_").replaceAll("_+", "_")
    val base = cleaned.stripPrefix("_").stripSuffix("_")
    val named = if (base.isEmpty) "col" else base
    if (named.head.isDigit) s"c_$named" else named
  }

  /** [[sanitizeName]] over a whole name list; dedupe collisions with _2,
    * _3, ... Generated names are themselves recorded, so a later column
    * that sanitizes to an already-generated name (e.g. a literal "a_2"
    * after two "a"s) still comes out unique.
    */
  def sanitizeNames(names: Seq[String]): Seq[String] = {
    val used = scala.collection.mutable.Set.empty[String]
    names.map { c =>
      val base = sanitizeName(c)
      var candidate = base
      var n = 1
      while (used.contains(candidate)) {
        n += 1
        candidate = s"${base}_$n"
      }
      used += candidate
      candidate
    }
  }

  /** Sanitize all column names; dedupe collisions with _2, _3, ... */
  def sanitizeColumns(df: DataFrame): DataFrame =
    df.toDF(sanitizeNames(df.columns.toIndexedSeq): _*)

  /** Schema-level sanitization: the same renaming applied to a
    * [[StructType]] instead of a frame. For schema-carrying sources (CSV
    * with `enforceSchema`, the positional default) this FUSES the rename
    * into the scan itself — at 4,000+ columns a rename `Project` on top
    * of the scan costs tens of seconds of whole-projection codegen
    * compilation alone (width-probed), while a renamed scan schema costs
    * nothing. Sanitize the schema, not the rows.
    */
  def sanitizeSchema(schema: StructType): StructType =
    StructType(schema.fields.zip(sanitizeNames(schema.fields.map(_.name).toIndexedSeq))
      .map { case (f, n) => f.copy(name = n) })

  /** Schema evolution across files: union an arbitrary set of frames by
    * column name, null-padding columns a frame lacks. Declarative
    * `unionByName(allowMissingColumns)` so Catalyst still prunes/pushes
    * through the union — no driver-side row munging.
    */
  def unifySchemas(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unifySchemas: empty input")
    dfs.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** Cast a frame's columns to the types of `target` (by name, where both
    * exist) — used to re-impose a canonical schema after inference-based
    * reads (CSV/JSON roundtrips).
    */
  def conformTo(df: DataFrame, target: StructType): DataFrame = {
    val types = target.fields.map(f => f.name -> f.dataType).toMap
    val cols: Array[Column] = df.columns.map { c =>
      types.get(c).map(t => col(c).cast(t).as(c)).getOrElse(col(c))
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
