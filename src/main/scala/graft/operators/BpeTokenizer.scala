package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned BYTE-PAIR-ENCODING tokenizer — the real thing behind the
  * brief's "token counting (whitespace + a BPE-ish regex)": merges are
  * LEARNED from corpus statistics (Sennrich et al. 2016, the
  * GPT-2/SentencePiece family's core algorithm), then applied
  * distributedly.
  *
  * Shape at scale:
  *  - TRAINING is driver-side over a bounded deterministic sample
  *    (md5-ordered docs, like the IVF/PQ codebooks): BPE training is
  *    inherently sequential (each merge depends on the counts AFTER the
  *    previous merge), so the scalable deployment is train-small,
  *    encode-everywhere — the merge table is a model artifact of
  *    `numMerges` rows, not data.
  *  - ENCODING is a per-record imperative loop (greedy lowest-rank merge,
  *    the standard BPE encode) over the broadcast merge ranks, placed in
  *    `mapPartitions` like the media codecs — per-partition setup cost
  *    amortized, no shuffle, cost linear in corpus bytes.
  *
  * Correctness: training and encoding are fully deterministic (max-count
  * merge with lexicographic tie-break; left-to-right merge application),
  * so the distributed encode is partition-order-free. The oracle-checked
  * invariant is LOSSLESSNESS: detokenize(encode(text)) must equal the
  * whitespace-normalized text, which DuckDB recomputes independently —
  * BPE-ness itself (which merges are learned, how words segment) is
  * pinned by planted-ground-truth specs, since no external engine can
  * re-run the training.
  */
object BpeTokenizer {

  /** end-of-word marker, its own symbol; decode renders it as a space */
  val EndOfWord = "</w>"

  val DefaultMerges = 200
  val DefaultSampleDocs = 200

  type Merge = (String, String)

  /** Learn `numMerges` merges from (word, count) statistics: repeatedly
    * merge the most frequent adjacent symbol pair (ties to the
    * lexicographically smallest pair — deterministic across runs and
    * machines). Stops early when no pair occurs twice.
    */
  def train(words: Seq[(String, Long)], numMerges: Int = DefaultMerges): Vector[Merge] = {
    var segs: Vector[(Vector[String], Long)] = words
      .filter(_._1.nonEmpty)
      .groupMapReduce(_._1)(_._2)(_ + _)
      .toVector
      .map { case (w, n) => (w.map(_.toString).toVector :+ EndOfWord, n) }
    val merges = Vector.newBuilder[Merge]
    var k = 0
    while (k < numMerges) {
      val counts = scala.collection.mutable.Map[Merge, Long]()
      for ((syms, n) <- segs; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + n))
      val best = counts.filter(_._2 >= 2L)
      if (best.isEmpty) k = numMerges
      else {
        val pair = best.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += pair
        segs = segs.map { case (syms, n) => (applyMerge(syms, pair), n) }
        k += 1
      }
    }
    merges.result()
  }

  /** one left-to-right pass replacing every occurrence of `pair` */
  private def applyMerge(syms: Vector[String], pair: Merge): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Standard greedy BPE encode of one word: repeatedly apply the
    * LOWEST-RANKED applicable merge until none applies.
    */
  def encodeWord(word: String, ranks: Map[Merge, Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: Merge = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else syms = applyMerge(syms, bestPair)
    }
    syms
  }

  /** Whitespace pre-tokenize (trim + `\s+`, the corpus contract every
    * text oracle in this repo already relies on), then BPE per word.
    */
  def encode(text: String, ranks: Map[Merge, Int]): Vector[String] = {
    val t = text.trim
    if (t.isEmpty) Vector.empty
    else t.split("\\s+").toVector.flatMap(w => encodeWord(w, ranks))
  }

  /** Inverse of [[encode]] up to whitespace normalization: symbols
    * concatenate back into words, end-of-word markers become single
    * spaces.
    */
  def decode(tokens: Seq[String]): String =
    tokens.mkString.split(EndOfWord, -1).mkString(" ").trim

  /** Train on the deterministic sample of a corpus and return the ranks
    * map (merge -> rank). Sample = first `sampleDocs` docs by
    * (md5(id), id) — reproducible across partitionings and sessions.
    */
  def trainOnCorpus(docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int = DefaultMerges,
      sampleDocs: Int = DefaultSampleDocs): Map[Merge, Int] = {
    val sample = docs
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(sampleDocs)
      .select(col(textCol)).collect().map(_.getString(0))
    val wordCounts = sample.iterator
      .flatMap(t => if (t == null) Iterator.empty
        else t.trim.split("\\s+").iterator.filter(_.nonEmpty))
      .toSeq.groupMapReduce(identity)(_ => 1L)(_ + _).toSeq
    train(wordCounts, numMerges).zipWithIndex.toMap
  }

  /** Persist a trained model as an ordinary lake table of
    * (rank, left, right) rows — the merge list is a DATA artifact like
    * the IVF centroids: versioned, time-travelable, taggable, and loadable
    * by a cold session with no re-training (the amortization a 100 TB
    * corpus demands: train once on the bounded sample, encode everywhere,
    * forever).
    */
  def saveModel(catalog: graft.lake.LakeCatalog, ns: String, table: String,
      ranks: Map[Merge, Int]): Int = {
    val s = org.apache.spark.sql.SparkSession.active
    import s.implicits._
    catalog.write(ns, table,
      ranks.toSeq.map { case ((a, b), r) => (r, a, b) }
        .sortBy(_._1).toDF("rank", "left", "right"))
  }

  /** Cold-start: the stored merge table, back as a ranks map. The collect
    * is BOUNDED by construction: the table holds exactly the trained merge
    * list (≤ `numMerges` rows, written by [[saveModel]]) — a model
    * artifact, never data-proportional.
    */
  def loadModel(catalog: graft.lake.LakeCatalog, ns: String,
      table: String): Map[Merge, Int] =
    catalog.read(ns, table).select("rank", "left", "right").collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap

  /** Distributed encode: (id, tokens, n_tokens, detok) per document. The
    * ranks map rides the closure (a few KB — numMerges entries).
    */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
      ranks: Map[Merge, Int]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = encode(if (text == null) "" else text, ranks)
          (id, toks, toks.length.toLong, decode(toks))
        }
      }
      .toDF("id", "tokens", "n_tokens", "detok")
  }

  /** Driver-checked query: learned-BPE encode of every document, surfaced
    * as the oracle-checkable LOSSLESSNESS invariant — md5 of the
    * detokenized text must equal md5 of the whitespace-normalized
    * original, which DuckDB computes with no knowledge of the tokenizer.
    * Exact token counts and merge contents are engine-private
    * (training cannot be replayed by another engine) and are pinned by
    * BpeTokenizerSpec's planted ground truth instead.
    */
  val textBpeRoundtrip: Q = Q(
    "text_bpe_roundtrip",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val ranks = trainOnCorpus(docs, "doc_id", "text")
      encodeCorpus(docs, "doc_id", "text", ranks)
        .select(col("id").as("doc_id"), md5(col("detok")).as("detok_md5"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
      md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS detok_md5
    FROM documents ORDER BY doc_id""")
  )

  val all: Seq[Q] = Seq(textBpeRoundtrip)
}
