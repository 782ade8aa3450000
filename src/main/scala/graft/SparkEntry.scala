package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every registered engine operation (SURVEY §2) into the
  * driver-facing `queries` / `oracleSql` maps.
  */
object SparkEntry {

  /** All registered operations, module by module (SURVEY §2 sections). */
  def registry: Seq[Q] =
    operators.Relational.all ++ operators.RelationalTpch.all ++
      operators.RelationalAnalytics.all ++
      operators.IngestLake.all ++
      operators.Dedup.all ++ operators.TextAnalysis.all ++ operators.Curation.all ++
      operators.BpeTokenizer.all ++
      operators.Similarity.all ++
      operators.Multimodal.all ++ operators.TopK.all ++
      streaming.StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q5LocalSupplier.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.sql.map(q.name -> _)).toMap
}
