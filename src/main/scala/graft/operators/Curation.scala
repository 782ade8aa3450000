package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus-curation operators every large training-data pipeline runs before
  * training (SURVEY §2 D continued): benchmark decontamination, per-domain
  * caps, and target-distribution resampling. All declarative, all
  * oracle-checked.
  */
object Curation {

  /** token n-grams of a token array as joined strings — empty below n
    * tokens (a document shorter than the window can't collide).
    */
  def ngramsOf(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - (n - 1)),
        i => array_join(slice(tk, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  private val DecontamN = 5

  /** Benchmark DECONTAMINATION (the GPT-3/Pile recipe): a document is
    * contaminated when it shares ANY token n-gram with the benchmark set —
    * here the deterministic holdout `doc_id % 97 == 0`, standing in for an
    * eval suite. Scale shape: the benchmark's distinct gram set is small
    * by construction and broadcasts into a semi-join against the exploded
    * candidate grams; candidates are never shuffled, and the flagged-id
    * set reduces map-side.
    */
  val textDecontaminate: Q = Q(
    "text_decontaminate",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), col("source"), wsTokens(lower(col("text"))).as("tk"))
      val isBench = col("doc_id") % 97 === 0
      val benchGrams = docs.filter(isBench)
        .select(explode(ngramsOf(col("tk"), DecontamN)).as("g")).distinct()
      val cand = docs.filter(!isBench)
      val flagged = cand
        .select(col("doc_id"), explode(ngramsOf(col("tk"), DecontamN)).as("g"))
        .join(benchGrams, Seq("g"), "left_semi")
        .select("doc_id").distinct()
        .withColumn("hit", lit(1L))
      cand.join(flagged, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
        .orderBy("source")
    },
    Some("""WITH toks AS (
      SELECT doc_id, source,
        CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
             ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      FROM documents),
    bench AS (
      SELECT DISTINCT unnest(list_transform(range(1, len(tk) - 3),
        i -> array_to_string(tk[i:i+4], ' '))) AS g
      FROM toks WHERE doc_id % 97 = 0 AND len(tk) >= 5),
    cand AS (SELECT doc_id, source, tk FROM toks WHERE doc_id % 97 <> 0),
    flagged AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(tk) - 3),
          i -> array_to_string(tk[i:i+4], ' '))) AS g
        FROM cand WHERE len(tk) >= 5) cg
      WHERE g IN (SELECT g FROM bench))
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM flagged) THEN 1 ELSE 0 END) AS BIGINT)
        AS n_contaminated
    FROM cand GROUP BY source ORDER BY source""")
  )

  private val DomainCap = 50

  /** Per-DOMAIN cap (diversity guard: no source may dominate the corpus):
    * keep the first `DomainCap` documents per source by doc_id. Runs on
    * the engine's own TopKPerGroup physical operator — bounded heaps
    * before the shuffle, no per-domain sort of the full corpus — so a
    * 100 TB source with billions of docs costs the same heap as a small
    * one (the few-distinct-domains skew that breaks a window).
    */
  val textDomainCap: Q = Q(
    "text_domain_cap",
    (s, dir) => {
      val docs = Tables(s, dir).documents.select("doc_id", "source", "n_chars")
      TopK.perGroup(docs, Seq(col("source")), Seq(col("doc_id").asc), DomainCap)
        .orderBy("source", "doc_id")
    },
    Some(s"""SELECT doc_id, source, n_chars FROM (
      SELECT doc_id, source, n_chars,
        row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents) r
    WHERE rn <= $DomainCap ORDER BY source, doc_id""")
  )

  /** Target-distribution RESAMPLING (domain mixing): deterministically
    * hash-sample each source toward a uniform target share. The keep rate
    * per source is `min(1, total / (num_sources * count_s))`, applied as
    * an md5-prefix threshold — reproducible across engines, partitionings
    * and cluster sizes (no rand()), the same mechanism as q_det_sample
    * but with a data-dependent per-source rate. The per-source stats
    * frame is tiny and broadcasts back onto the corpus; the corpus itself
    * is one filter + partial agg, never shuffled by a window.
    */
  val textMixResample: Q = Q(
    "text_mix_resample",
    (s, dir) => {
      val docs = Tables(s, dir).documents.select("doc_id", "source")
      val counts = docs.groupBy("source").agg(count(lit(1)).as("cnt"))
      val withTotals = counts
        .crossJoin(counts.agg(sum("cnt").as("total"), count(lit(1)).as("nsrc")))
        .withColumn("rate",
          least(lit(1.0), col("total") / (col("nsrc") * col("cnt"))))
        .withColumn("thresh", floor(col("rate") * 256).cast("int"))
        .select("source", "cnt", "rate", "thresh")
      docs.join(broadcast(withTotals), Seq("source"))
        .withColumn("keep",
          col("thresh") >= 256 ||
            substring(md5(col("doc_id").cast("string")), 1, 2) <
              format_string("%02x", col("thresh")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"))
        .orderBy("source")
    },
    Some("""WITH counts AS (SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source),
    totals AS (SELECT SUM(cnt) AS total, COUNT(*) AS nsrc FROM counts),
    rates AS (
      SELECT source, cnt,
        CAST(floor(least(1.0, total / (nsrc * cnt)) * 256) AS INT) AS thresh
      FROM counts, totals)
    SELECT d.source, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN r.thresh >= 256
        OR substring(md5(d.doc_id::VARCHAR), 1, 2) < printf('%02x', r.thresh)
        THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents d JOIN rates r USING (source)
    GROUP BY d.source ORDER BY d.source""")
  )

  /** Deterministic stratified TRAIN/VAL/TEST SPLIT assignment (90/5/5 by
    * md5 of the stable document key): the split every training pipeline
    * needs, computed as a pure per-row projection — no rand() (whose
    * draws depend on partitioning and retries), no global sort, no
    * shuffle. Stratification is implicit: a uniform hash splits EVERY
    * stratum at the target rates regardless of corpus skew, so per-lang /
    * per-source proportions hold without a per-stratum pass. The full
    * per-document assignment is the query output — the oracle checks the
    * complete mapping, not summary counts — and membership is stable
    * under corpus growth: a document's split never changes when other
    * documents are added or removed, which is what makes downstream
    * eval-set contamination tracking possible at all. 100 TB shape:
    * embarrassingly parallel, zero exchanges before the verification
    * sort.
    */
  val textSplitAssign: Q = Q(
    "text_split",
    (s, dir) => {
      val h = expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 100")
      Tables(s, dir).documents.select(col("doc_id"), col("lang"))
        .withColumn("split",
          when(h < 90, "train").when(h < 95, "val").otherwise("test"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang,
      CASE WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90 THEN 'train'
           WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 95 THEN 'val'
           ELSE 'test' END AS split
    FROM documents ORDER BY doc_id""")
  )

  // re-exported tokenizer to keep the gram definition identical to the
  // text-analysis family's
  private def wsTokens(c: Column): Column = TextAnalysis.wsTokens(c)

  /** SEMANTIC benchmark decontamination — the embedding-space complement
    * of the 5-gram exact screen above (paraphrased eval contamination
    * slips through token overlap; it does not slip past cosine
    * similarity). A small benchmark embedding set broadcasts into a
    * cosine-threshold join against the corpus; matching corpus members
    * are dropped by left-anti. Planted contamination (exact copies of
    * benchmark vectors) makes the op's effect provable at every SF.
    *
    * Scale shape: the benchmark side is eval-suite-sized by definition
    * (thousands), so the screen is a broadcast nested-loop with the
    * codegen'd cosine — the corpus is never shuffled and never
    * self-joined; cost is O(corpus × benchmark) FLOPs, embarrassingly
    * parallel. For benchmark sets past broadcast comfort, the LSH/IVF
    * bucketing from the ANN family applies unchanged.
    */
  val textSemanticDecontam: Q = Q(
    "text_semantic_decontam",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
      val bench = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("bench_id"), col("embedding").as("b_emb"))
      // corpus: the non-benchmark vectors plus planted exact copies of the
      // benchmark (the contamination the screen must provably remove)
      val corpus = emb.filter(col("vec_id") >= 20)
        .select("vec_id", "embedding")
        .unionByName(emb.filter(col("vec_id") < 20)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      val contaminated = corpus
        .join(broadcast(bench),
          Similarity.cosine(col("embedding"), col("b_emb")) >= 0.95)
        .select("vec_id").distinct()
      corpus.join(contaminated, Seq("vec_id"), "left_anti")
        .select("vec_id")
        .orderBy("vec_id")
    },
    Some("""WITH bench AS (
      SELECT vec_id AS bench_id, embedding AS b_emb FROM embeddings WHERE vec_id < 20),
    corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 20
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id < 20),
    bad AS (
      SELECT DISTINCT vec_id FROM corpus, bench
      WHERE list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len(embedding)+1),
          i -> embedding[i]::DOUBLE * b_emb[i]::DOUBLE)), (x,y) -> x+y)
        / (sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len(embedding)+1),
            i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)), (x,y) -> x+y))
         * sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len(b_emb)+1),
            i -> b_emb[i]::DOUBLE * b_emb[i]::DOUBLE)), (x,y) -> x+y))) >= 0.95)
    SELECT vec_id FROM corpus WHERE vec_id NOT IN (SELECT vec_id FROM bad)
    ORDER BY vec_id""")
  )

  val all: Seq[Q] = Seq(textDecontaminate, textDomainCap, textMixResample,
    textSemanticDecontam, textSplitAssign)
}
