package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §2 D6-D7):
  * brute-force cosine top-k as the exact baseline, and random-hyperplane
  * LSH bucketing as the scale path.
  *
  * Scale design: the query set is small and **broadcast** — the corpus is
  * never shuffled for brute force; each corpus partition scores its rows
  * against the broadcast queries and a windowed top-k per query reduces
  * partial results. The LSH path buckets both sides on a 16-bit signature so
  * the join touches only same-bucket rows (~1/65536 of the cross product for
  * random vectors). Distances are computed in double precision columnar
  * higher-order functions — no UDF serialization on the hot path.
  */
object Similarity {

  /** cosine similarity of two float-array columns, in double precision */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  val SigBits = 16

  /** Random-hyperplane signature of an embedding, packed to a long (native
    * Catalyst expression graft.functions.HyperplaneSig). Same-signature
    * vectors are "probably similar" (each bit halves the angular space).
    * Bit count trades recall for bucket size: 16 bits for high-precision
    * dedup bucketing, 8 for ANN candidate buckets.
    */
  def hyperplaneSig(vec: Column, bits: Int = SigBits): Column =
    call_function("graft_hyperplane_sig", vec, lit(bits))

  private val TopK = 5
  private val NumQueries = 10

  val annBruteforce: Q = Q(
    "ann_bruteforce",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
      val queries = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      val scored = corpus
        .join(broadcast(queries), col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosine(col("q_emb"), col("embedding")).as("score"))
      val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("neighbor_id"))
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select("query_id", "rank", "neighbor_id", "score")
        .orderBy("query_id", "rank")
    },
    None // float-derived scores — exactness pinned in SimilaritySpec
  )

  val annLsh: Q = Q(
    "ann_lsh",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
      val signed = emb.select(col("vec_id"), col("embedding"),
        hyperplaneSig(col("embedding"), bits = 8).as("sig"))
      val queries = signed.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("sig"))
      val corpus = signed.select(col("vec_id").as("neighbor_id"), col("embedding"), col("sig"))
      val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("neighbor_id"))
      corpus
        .join(broadcast(queries), Seq("sig"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosine(col("q_emb"), col("embedding")).as("score"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select("query_id", "rank", "neighbor_id", "score")
        .orderBy("query_id", "rank")
    },
    None // bucketed approximate variant — recall pinned in SimilaritySpec
  )

  val all: Seq[Q] = Seq(annBruteforce, annLsh)
}
