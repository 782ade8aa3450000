package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2 D8-D11):
  * language ID, quality scoring, token counting, document fingerprinting.
  * All computed with built-in (codegen'd) SQL functions or higher-order
  * array functions — fully columnar, no UDFs, no shuffles beyond the final
  * aggregation, so each scales linearly with documents at 100 TB.
  */
object TextAnalysis {

  // ---- tokenization ------------------------------------------------------

  /** whitespace tokens of trimmed text (empty text → empty array) */
  def wsTokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** BPE-ish lexer token count: letter runs, digit runs, single punctuation
    * marks — the usual pre-tokenizer shape (ASCII classes only, so Java and
    * RE2 regex semantics agree).
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeishCount(c: Column): Column = regexp_count(c, lit(BpeishPattern))

  // ---- quality -----------------------------------------------------------

  /** ratio helper: int counts → exact double division */
  private def ratio(num: Column, den: Column): Column =
    num.cast("double") / den.cast("double")

  val Stopwords = Seq("the", "a", "an", "of", "and", "in", "to", "is", "it", "for")

  def stopwordCount(tokens: Column): Column =
    size(filter(tokens, t => t.isin(Stopwords.map(x => x: Any): _*)))

  /** Heuristic quality features + a weighted score, all deterministic
    * double arithmetic (identical expression shape to the SQL oracle).
    */
  def qualityColumns(text: Column): Seq[Column] = {
    val toks = wsTokens(text)
    val nChars = length(text)
    val nToks = size(toks)
    Seq(
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      ratio(length(regexp_replace(text, "[^A-Za-z]", "")), nChars).as("alpha_ratio"),
      ratio(regexp_count(text, lit("[^A-Za-z0-9\\s]")), nChars).as("punct_ratio"),
      ratio(stopwordCount(toks), nToks).as("stopword_ratio"),
      ratio(size(array_distinct(toks)), nToks).as("distinct_token_ratio")
    )
  }

  // ---- language ID -------------------------------------------------------

  /** Tiny per-language stopword profiles (public-knowledge function words). */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "de", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "une", "des", "du", "pas")
  )

  /** Language-ID heuristic: CJK character ratio → zh; otherwise argmax of
    * stopword hits with deterministic tie-break (profile order). Columnar:
    * one pass over the token array per profile.
    */
  def langIdColumns(text: Column): (Column, Column) = {
    val toks = wsTokens(lower(text))
    val cjk = regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]"))
    val scores = LangProfiles.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words.map(x => x: Any): _*)))
    }
    // argmax with first-wins tie-break, folded right to left
    val (bestLang, bestScore) = scores.reverse.tail.foldLeft(
      (lit(scores.last._1), scores.last._2)) { case ((accL, accS), (lang, sc)) =>
      (when(sc >= accS, lit(lang)).otherwise(accL), when(sc >= accS, sc).otherwise(accS))
    }
    val pred = when(ratio(cjk, length(text)) > 0.05, lit("zh")).otherwise(bestLang)
    val conf = when(ratio(cjk, length(text)) > 0.05, ratio(cjk, length(text)))
      .otherwise(ratio(bestScore, size(toks)))
    (pred, conf)
  }

  // ---- fingerprint -------------------------------------------------------

  /** 64-bit polynomial rolling hash (base 31, wrapping) over the normalized
    * text (lowercased, whitespace collapsed) — a deterministic content
    * fingerprint for exact-dup detection that's stable under whitespace /
    * case noise. Native expression (graft.functions.Fingerprint64): wrapping
    * long arithmetic, unaffected by ANSI overflow checks.
    */
  def fingerprint(text: Column): Column = call_function("graft_fingerprint64", text)

  // ---- registered queries ------------------------------------------------

  val textTokens: Q = Q(
    "text_tokens",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .filter(length(trim(col("text"))) > 0) // empty text: engines disagree on split semantics
        .select(
          col("doc_id"),
          size(wsTokens(col("text"))).as("ws_tokens"),
          bpeishCount(col("text")).as("bpeish_tokens"),
          length(col("text")).as("n_chars"))
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
      len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
      len(regexp_extract_all(text, '$BpeishPattern')) AS bpeish_tokens,
      length(text) AS n_chars
    FROM documents WHERE trim(text) <> '' ORDER BY doc_id""")
  )

  val textQuality: Q = Q(
    "text_quality",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id") +: qualityColumns(col("text")): _*)
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
      length(text) AS n_chars,
      len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
      CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
      CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / length(text) AS punct_ratio,
      CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
        t -> list_contains([${Stopwords.map("'" + _ + "'").mkString(",")}], t))) AS DOUBLE)
        / len(regexp_split_to_array(trim(text), '\\s+')) AS stopword_ratio,
      CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS DOUBLE)
        / len(regexp_split_to_array(trim(text), '\\s+')) AS distinct_token_ratio
    FROM documents WHERE trim(text) <> '' ORDER BY doc_id""")
  )

  val textLangId: Q = Q(
    "text_langid",
    (s, dir) => {
      val t = Tables(s, dir)
      val (pred, conf) = langIdColumns(col("text"))
      t.documents
        .select(col("doc_id"), col("lang").as("labeled_lang"), pred.as("pred_lang"),
          conf.as("confidence"))
        .orderBy("doc_id")
    },
    // Exact DuckDB twin of the heuristic: same stopword profiles, same
    // first-wins argmax tie-break (en>de>es>fr), same double ratios.
    Some("""WITH base AS (
      SELECT doc_id, lang AS labeled_lang, text,
        CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
             ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk,
        len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS cjk,
        len(text) AS nchars
      FROM documents),
    scored AS (
      SELECT doc_id, labeled_lang, tk, cjk, nchars,
        len(list_filter(tk, t -> t IN ('the','and','of','to','in','is','that','it','for','with'))) AS s_en,
        len(list_filter(tk, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','für','auf'))) AS s_de,
        len(list_filter(tk, t -> t IN ('el','la','los','las','es','y','que','de','un','una'))) AS s_es,
        len(list_filter(tk, t -> t IN ('le','la','les','et','est','que','une','des','du','pas'))) AS s_fr
      FROM base),
    best AS (
      SELECT doc_id, labeled_lang, cjk, nchars, len(tk) AS ntok,
        CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
             WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
             WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS bl,
        greatest(s_en, s_de, s_es, s_fr) AS bs
      FROM scored)
    SELECT doc_id, labeled_lang,
      CASE WHEN cjk::DOUBLE / nchars::DOUBLE > 0.05 THEN 'zh' ELSE bl END AS pred_lang,
      CASE WHEN cjk::DOUBLE / nchars::DOUBLE > 0.05 THEN cjk::DOUBLE / nchars::DOUBLE
           ELSE bs::DOUBLE / ntok::DOUBLE END AS confidence
    FROM best ORDER BY doc_id""")
  )

  val textFingerprint: Q = Q(
    "text_fingerprint",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .select(col("doc_id"), fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    },
    // Exact DuckDB twin: the wrapping base-31 poly hash re-expressed as a
    // HUGEINT fold mod 2^64, then mapped back to signed 64-bit. Character
    // iteration matches because the corpus is BMP text (UTF-16 units ==
    // code points).
    Some("""WITH norm AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
    fp AS (
      SELECT doc_id,
        list_reduce(
          list_prepend(1125899906842597::HUGEINT,
            list_transform(range(1, len(t)+1), i -> unicode(t[i])::HUGEINT)),
          (h, c) -> (h * 31 + c) % 18446744073709551616::HUGEINT) AS uh
      FROM norm)
    SELECT doc_id,
      CASE WHEN uh >= 9223372036854775808::HUGEINT
           THEN (uh - 18446744073709551616::HUGEINT)::BIGINT
           ELSE uh::BIGINT END AS fingerprint
    FROM fp ORDER BY doc_id""")
  )

  /** Quality gate: keep documents passing heuristic thresholds — the filter
    * stage a training-data pipeline runs after scoring. Identical expression
    * shape on both engines, so the oracle checks the *filter semantics*,
    * not just the scores.
    */
  val textQualityFilter: Q = Q(
    "text_quality_filter",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = wsTokens(col("text"))
      t.documents
        .select(col("doc_id"), col("lang"), size(toks).as("n_tokens"),
          ratio(size(array_distinct(toks)), size(toks)).as("distinct_token_ratio"))
        .filter(col("n_tokens") >= 20 && col("n_tokens") <= 100 &&
          col("distinct_token_ratio") >= 0.5)
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang,
      len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
      CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE)
        / len(regexp_split_to_array(trim(text), '\s+')) AS distinct_token_ratio
    FROM documents
    WHERE len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 20 AND 100
      AND CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE)
        / len(regexp_split_to_array(trim(text), '\s+')) >= 0.5
    ORDER BY doc_id""")
  )

  /** Corpus vocabulary statistics: document frequency of each distinct
    * token — the profiling pass behind IDF weighting, vocabulary pruning,
    * and stopword discovery. Per-doc distinct tokens explode once (the only
    * shuffle is the term groupBy, map-side combined); counts are
    * integer-exact so the oracle checks the full tokenize→dedupe→count
    * pipeline.
    */
  val textTermDocfreq: Q = Q(
    "text_term_docfreq",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .filter(length(trim(col("text"))) > 0)
        .select(explode(array_distinct(wsTokens(lower(col("text"))))).as("term"))
        .groupBy("term")
        .agg(count(lit(1)).as("df_count"))
        .orderBy(desc("df_count"), asc("term"))
        .limit(20)
    },
    Some("""SELECT term, COUNT(*) AS df_count FROM (
      SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS term
      FROM documents) sub
    GROUP BY term ORDER BY df_count DESC, term LIMIT 20""")
  )

  /** End-to-end curation pipeline — the composition a training-data run
    * executes: quality gate → exact dedup (keep-first) → per-language
    * token accounting. Every stage is SQL-expressible, so the oracle
    * checks the COMPOSED pipeline, not just each stage in isolation.
    */
  val pipelineCurate: Q = Q(
    "pipeline_curate",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val toks = wsTokens(col("text"))
      val passed = t.documents
        .withColumn("n_tokens", size(toks))
        .withColumn("distinct_ratio", ratio(size(array_distinct(toks)), size(toks)))
        .filter(col("n_tokens") >= 20 && col("n_tokens") <= 100 &&
          col("distinct_ratio") >= 0.5)
      val w = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
      val deduped = passed.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      deduped
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_ws_tokens"),
          sum(bpeishCount(col("text"))).as("total_bpeish_tokens"))
        .orderBy("lang")
    },
    Some(s"""WITH passed AS (
      SELECT doc_id, lang, text,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
      FROM documents
      WHERE len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 20 AND 100
        AND CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS DOUBLE)
          / len(regexp_split_to_array(trim(text), '\\s+')) >= 0.5),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM passed) sub
      WHERE rn = 1)
    SELECT lang, COUNT(*) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS total_ws_tokens,
      CAST(SUM(len(regexp_extract_all(text, '$BpeishPattern'))) AS BIGINT) AS total_bpeish_tokens
    FROM deduped GROUP BY lang ORDER BY lang""")
  )

  /** PII/URL scrubbing: redact emails and URLs with typed placeholders —
    * the cleaning stage before text enters a training corpus. The corpus has
    * no native PII, so the query plants deterministic contaminated suffixes
    * (same expression on both engines) and the oracle checks that redaction
    * transforms them identically.
    */
  val textScrub: Q = Q(
    "text_scrub",
    (s, dir) => {
      val t = Tables(s, dir)
      val contaminated = when(col("doc_id") % 5 === 0,
        concat(col("text"),
          lit(" contact user"), col("doc_id"),
          lit("@example.com or https://example.com/d/"), col("doc_id")))
        .otherwise(col("text"))
      val scrubbed = regexp_replace(
        regexp_replace(contaminated, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
        "https?://[^ ]+", "<URL>")
      t.documents
        .select(col("doc_id"),
          length(scrubbed).as("scrubbed_len"),
          regexp_count(scrubbed, lit("<EMAIL>|<URL>")).as("n_redactions"),
          md5(scrubbed).as("scrubbed_md5"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
      length(scrubbed) AS scrubbed_len,
      len(regexp_extract_all(scrubbed, '<EMAIL>|<URL>')) AS n_redactions,
      md5(scrubbed) AS scrubbed_md5
    FROM (
      SELECT doc_id, regexp_replace(
        regexp_replace(
          CASE WHEN doc_id % 5 = 0
            THEN text || ' contact user' || doc_id || '@example.com or https://example.com/d/' || doc_id
            ELSE text END,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        'https?://[^ ]+', '<URL>', 'g') AS scrubbed
      FROM documents) sub
    ORDER BY doc_id""")
  )

  /** Document chunking: fixed-size overlapping token windows (50 tokens,
    * stride 40) — how long documents become training samples. The oracle
    * md5s every chunk's joined tokens, so window boundaries, overlap and
    * content all match across engines exactly.
    */
  val textChunk: Q = Q(
    "text_chunk",
    (s, dir) => {
      val t = Tables(s, dir)
      val ChunkSize = 50
      val Stride = 40
      val toks = wsTokens(col("text"))
      val nChunks = when(size(toks) <= ChunkSize, lit(1))
        .otherwise(ceil((size(toks) - ChunkSize) / lit(Stride.toDouble)).cast("int") + 1)
      t.documents
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), toks.as("toks"), nChunks.as("n_chunks"))
        .select(col("doc_id"),
          explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_idx"),
          col("toks"))
        .select(col("doc_id"), col("chunk_idx"),
          slice(col("toks"), col("chunk_idx") * Stride + 1, lit(ChunkSize)).as("chunk"))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).as("chunk_tokens"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    },
    Some("""WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t,
        len(regexp_split_to_array(trim(text), '\s+')) AS n
      FROM documents WHERE trim(text) <> ''),
    spans AS (
      SELECT doc_id, t,
        unnest(generate_series(0,
          CASE WHEN n <= 50 THEN 0 ELSE CAST(CEIL((n - 50) / 40.0) AS INT) END)) AS chunk_idx
      FROM toks)
    SELECT doc_id, chunk_idx,
      len(t[chunk_idx * 40 + 1 : chunk_idx * 40 + 50]) AS chunk_tokens,
      md5(array_to_string(t[chunk_idx * 40 + 1 : chunk_idx * 40 + 50], ' ')) AS chunk_md5
    FROM spans ORDER BY doc_id, chunk_idx""")
  )

  /** Sequence packing: assign documents to fixed-token-budget packs by
    * running token total (stream order = doc_id) — the sample-packing
    * pass that fills training sequences. Integer-exact throughout.
    */
  val textSeqPacking: Q = Q(
    "text_seq_packing",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val Budget = 2048
      val t = Tables(s, dir)
      // packing is inherently sequential: a global-order running total (one
      // window partition). At 100 TB you shard the stream first (pack per
      // shard, e.g. per source/date) — same operator per shard.
      val w = Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.documents
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), size(wsTokens(col("text"))).as("n_tokens"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .select(col("doc_id"), col("n_tokens"),
          ((col("cum_tokens") - col("n_tokens")) / Budget).cast("long").as("pack_id"),
          (col("cum_tokens") - col("n_tokens")).as("stream_offset"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, n_tokens,
      CAST(FLOOR((cum_tokens - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
      cum_tokens - n_tokens AS stream_offset
    FROM (
      SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) OVER (
          ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      FROM documents WHERE trim(text) <> '') sub
    ORDER BY doc_id""")
  )

  /** Corpus bigram statistics: top-20 token bigrams — the n-gram profiling
    * pass behind contamination screens and boilerplate detection. Bigrams
    * are generated columnar per row; the only shuffle is the count groupBy
    * (map-side combined).
    */
  /** token bigrams of a MATERIALIZED token-array column. Built with
    * zip_with(tk, tail) over a slice — constant work per element. (Building
    * this from the raw split() expression instead would inline the split
    * into every element access — O(tokens^2) re-tokenization per document.)
    */
  private def bigramsOf(tk: Column): Column =
    array_compact(zip_with(tk,
      slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b)))

  val textNgrams: Q = Q(
    "text_ngrams",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .select(wsTokens(lower(col("text"))).as("tk"))
        .select(explode(bigramsOf(col("tk"))).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("bigram"))
        .limit(20)
    },
    Some("""SELECT bigram, COUNT(*) AS n FROM (
      SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bigram
      FROM (SELECT CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
            FROM documents) toks) b
    GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""")
  )

  /** Stopword stripping as a transformation (not just a count): the reduced
    * token stream is re-joined and content-hashed so the oracle checks the
    * exact output text of every document.
    */
  val textStopwordStrip: Q = Q(
    "text_stopword_strip",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = wsTokens(lower(col("text")))
      val kept = filter(toks, tk => !tk.isin(Stopwords.map(x => x: Any): _*))
      t.documents
        .select(col("doc_id"), size(toks).as("n_tokens"), size(kept).as("kept_tokens"),
          md5(array_join(kept, " ")).as("stripped_md5"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, len(tk) AS n_tokens, len(kept) AS kept_tokens,
      md5(array_to_string(kept, ' ')) AS stripped_md5
    FROM (
      SELECT doc_id, tk,
        list_filter(tk, t -> t NOT IN ('the','a','an','of','and','in','to','is','it','for')) AS kept
      FROM (SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
            FROM documents) toks) f
    ORDER BY doc_id""")
  )

  /** TF-IDF term weighting: top-3 salient terms per document, ranked by
    * tf * ln(N/df). The rank is hash-checked (score ordering is identical
    * across engines because equal (tf, df) give bit-equal scores); the raw
    * integers tf/df are output instead of the float score.
    */
  val textTfidf: Q = Q(
    "text_tfidf",
    (s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents.filter(length(trim(col("text"))) > 0)
      val terms = docs
        .select(col("doc_id"), explode(wsTokens(lower(col("text")))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = terms.groupBy("term").agg(count(lit(1)).as("df"))
      // the IDF denominator N joins in as a broadcast single-row aggregate:
      // the whole query stays ONE lazy plan (no driver-side count() job at
      // plan-build time, no second corpus scan outside the plan)
      val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
        .orderBy(desc("score"), asc("term"))
      terms.join(df, "term")
        .crossJoin(broadcast(n))
        .withColumn("score", col("tf") * log(col("n_docs") / col("df")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("doc_id", "rank", "term", "tf", "df")
        .orderBy("doc_id", "rank")
    },
    Some("""WITH docs AS (SELECT doc_id, text FROM documents WHERE trim(text) <> ''),
    terms AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM docs),
    tfs AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
    dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
    n AS (SELECT COUNT(*) AS n FROM docs),
    ranked AS (
      SELECT doc_id, term, tf, df,
        row_number() OVER (PARTITION BY doc_id
          ORDER BY tf * ln(n::DOUBLE / df::DOUBLE) DESC, term ASC) AS "rank"
      FROM tfs JOIN dfs USING (term), n)
    SELECT doc_id, "rank", term, tf, df FROM ranked
    WHERE "rank" <= 3 ORDER BY doc_id, "rank" """)
  )

  /** Repetition metrics (Gopher-style quality signals): most-frequent-token
    * share and duplicate-bigram share per document — exact int/int ratios.
    */
  val textRepetition: Q = Q(
    "text_repetition",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), wsTokens(lower(col("text"))).as("tk"))
        .withColumn("bg", bigramsOf(col("tk")))
        .select(col("doc_id"),
          (size(col("tk")) - size(array_distinct(col("tk")))).cast("long").as("dup_tokens"),
          ratio(aggregate(array_distinct(col("tk")), lit(0),
            (acc, tk) => greatest(acc, size(filter(col("tk"), x => x === tk)))),
            size(col("tk"))).as("top_token_ratio"),
          when(size(col("bg")) > 0,
            lit(1.0) - ratio(size(array_distinct(col("bg"))), size(col("bg"))))
            .otherwise(0.0).as("dup_bigram_ratio"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
      (len(tk) - len(list_distinct(tk)))::BIGINT AS dup_tokens,
      list_max(list_transform(list_distinct(tk),
        t -> len(list_filter(tk, x -> x = t))))::DOUBLE / len(tk)::DOUBLE AS top_token_ratio,
      CASE WHEN len(bg) > 0
           THEN 1.0 - len(list_distinct(bg))::DOUBLE / len(bg)::DOUBLE
           ELSE 0.0 END AS dup_bigram_ratio
    FROM (
      SELECT doc_id, tk, list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) AS bg
      FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
            FROM documents WHERE trim(text) <> '') t1) t2
    ORDER BY doc_id""")
  )

  /** Canonical text normalization: lowercase, strip non-alphanumerics
    * (keeping whitespace), collapse whitespace runs, trim — the normalize
    * pass before hashing/dedup. Output is content-hashed per document.
    */
  val textNormalize: Q = Q(
    "text_normalize",
    (s, dir) => {
      val t = Tables(s, dir)
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9\\s]", ""), "\\s+", " "))
      t.documents
        .select(col("doc_id"), length(norm).as("norm_len"), md5(norm).as("norm_md5"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, len(norm) AS norm_len, md5(norm) AS norm_md5 FROM (
      SELECT doc_id, trim(regexp_replace(
        regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS norm
      FROM documents) n
    ORDER BY doc_id""")
  )

  /** Compression-ratio quality signal: DEFLATE length over byte length per
    * document (native expression graft_deflate_len). Repetitive/templated
    * text compresses far below natural prose — the classic cheap filter
    * for boilerplate and spam. Deterministic but zlib-specific, so this is
    * spec-pinned (TextAnalysisSpec) rather than DuckDB-oracled.
    */
  val textCompression: Q = Q(
    "text_compression",
    (s, dir) => {
      val t = Tables(s, dir)
      val dlen = call_function("graft_deflate_len", col("text"))
      t.documents
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), octet_length(col("text")).as("byte_len"),
          dlen.as("deflate_len"),
          ratio(dlen, octet_length(col("text"))).as("compression_ratio"))
        .orderBy("doc_id")
    },
    None // zlib output is engine-local — spec-pinned, rows-only here
  )

  /** Corpus-frequency rarity signals — the exact-arithmetic stand-in for
    * LM-perplexity quality scoring (the CCNet/Gopher recipe ranks docs by
    * how "surprising" their n-grams are; without an external LM, corpus
    * frequencies ARE the model). Per document:
    *
    *   - `oov_tokens` / `oov_ratio`: tokens outside the top-V corpus
    *     vocabulary (V=100 here; tie-broken deterministically) — the
    *     vocabulary is a bounded top-k, so it BROADCASTS at any corpus
    *     size while the token stream is scored with a map-side join;
    *   - `rare_bigrams` / `novelty_ratio`: bigrams whose corpus count ≤ 2
    *     (hapax/dis legomena) — high novelty means unmodelable text
    *     (mojibake, boilerplate soup), near-zero means duplication. The
    *     bigram-frequency join shuffles on the bigram key, co-partitioned
    *     with the groupBy that produced the counts.
    *
    * Everything is integer counts + one final double division, so the
    * result is bit-deterministic across partition orders and engines —
    * deliberately NOT a log-space score, where libm vs JVM ulp drift
    * would make a distributed hash-compare flaky.
    */
  val textRarity: Q = Q(
    "text_rarity",
    (s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents.filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), wsTokens(lower(col("text"))).as("tk"))
      val tokens = docs.select(col("doc_id"), explode(col("tk")).as("token"))
      val bigrams = docs.select(col("doc_id"), explode(bigramsOf(col("tk"))).as("bigram"))
      val vocab = tokens.groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("token")).limit(100).select("token")
      val bigramFreq = bigrams.groupBy("bigram").agg(count(lit(1)).as("bn"))
      val oov = tokens
        .join(broadcast(vocab.withColumn("in_vocab", lit(1))), Seq("token"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1).otherwise(0)).as("oov_tokens"))
      val novelty = bigrams.join(bigramFreq, "bigram")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("bn") <= 2, 1).otherwise(0)).as("rare_bigrams"))
      oov.join(novelty, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("oov_tokens"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("rare_bigrams"), lit(0L)).as("rare_bigrams"),
          (col("oov_tokens").cast("double") / col("n_tokens").cast("double"))
            .as("oov_ratio"),
          when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
            .otherwise(col("rare_bigrams").cast("double") /
              col("n_bigrams").cast("double")).as("novelty_ratio"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      FROM documents WHERE trim(text) <> ''),
    tk AS (
      SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
        ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
      FROM documents WHERE trim(text) <> ''),
    bigrams AS (
      SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bigram
      FROM tk),
    vocab AS (
      SELECT token FROM (
        SELECT token, COUNT(*) AS n FROM toks GROUP BY token
        ORDER BY n DESC, token LIMIT 100)),
    bfreq AS (SELECT bigram, COUNT(*) AS bn FROM bigrams GROUP BY bigram),
    oov AS (
      SELECT t.doc_id, COUNT(*) AS n_tokens,
        CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens
      FROM toks t LEFT JOIN vocab v ON t.token = v.token
      GROUP BY t.doc_id),
    novelty AS (
      SELECT b.doc_id, COUNT(*) AS n_bigrams,
        CAST(SUM(CASE WHEN f.bn <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS rare_bigrams
      FROM bigrams b JOIN bfreq f ON b.bigram = f.bigram
      GROUP BY b.doc_id)
    SELECT o.doc_id, o.n_tokens, o.oov_tokens,
      COALESCE(n.n_bigrams, 0) AS n_bigrams,
      COALESCE(n.rare_bigrams, 0) AS rare_bigrams,
      CAST(o.oov_tokens AS DOUBLE) / CAST(o.n_tokens AS DOUBLE) AS oov_ratio,
      CASE WHEN COALESCE(n.n_bigrams, 0) = 0 THEN 0.0
        ELSE CAST(n.rare_bigrams AS DOUBLE) / CAST(n.n_bigrams AS DOUBLE) END AS novelty_ratio
    FROM oov o LEFT JOIN novelty n ON o.doc_id = n.doc_id
    ORDER BY o.doc_id""")
  )

  /** Intra-corpus SPAN dedup — the sub-document half of deduplication
    * (RefinedWeb/CCNet strip repeated paragraphs and boilerplate inside
    * otherwise-unique pages; doc-level dedup cannot see them). The corpus
    * is segmented into fixed 20-token spans (the testdata has no
    * paragraph breaks, so boundaries are synthetic — the operator is
    * boundary-agnostic), every span occurrence after the first
    * (first = smallest (doc_id, position)) is dropped corpus-wide, and
    * each document is REASSEMBLED from its surviving spans, content-
    * hashed so the oracle checks the exact rebuilt text. Scale shape:
    * one shuffle on span content for the keep-first window (the same
    * partitioning dedup_keep_first uses on whole docs), then a groupBy
    * doc_id for reassembly — both partial-agg-friendly, nothing
    * quadratic.
    */
  val textSpanDedup: Q = Q(
    "text_span_dedup",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val SegTokens = 20
      val docs = t.documents.filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), wsTokens(lower(col("text"))).as("tk"))
      val segs = docs.select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0), floor((size(col("tk")) - 1) / lit(SegTokens)).cast("int")),
            i => array_join(slice(col("tk"), i * SegTokens + 1, lit(SegTokens)), " ")))
          .as(Seq("seg_idx", "seg")))
      val w = Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
      segs.withColumn("rn", row_number().over(w))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_segs"),
          sum(when(col("rn") === 1, 1).otherwise(0)).as("kept_segs"),
          md5(array_join(
            transform(
              array_sort(collect_list(when(col("rn") === 1,
                struct(col("seg_idx"), col("seg"))))),
              x => x.getField("seg")),
            " ")).as("rebuilt_md5"))
        .orderBy("doc_id")
    },
    Some("""WITH tk AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
      FROM documents WHERE trim(text) <> ''),
    segs AS (
      SELECT doc_id, i AS seg_idx,
        array_to_string(tk[(i*20+1):(i*20+20)], ' ') AS seg
      FROM tk, UNNEST(range(0, ((len(tk)-1)//20)+1)) AS u(i)),
    ranked AS (
      SELECT doc_id, seg_idx, seg,
        row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
      FROM segs)
    SELECT doc_id,
      COUNT(*) AS n_segs,
      CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_segs,
      md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_idx), ''))
        AS rebuilt_md5
    FROM ranked GROUP BY doc_id ORDER BY doc_id""")
  )

  val all: Seq[Q] = Seq(textTokens, textQuality, textLangId, textFingerprint,
    textQualityFilter, textTermDocfreq, pipelineCurate, textScrub, textChunk,
    textSeqPacking, textNgrams, textStopwordStrip, textTfidf, textRepetition,
    textNormalize, textCompression, textRarity, textSpanDedup)
}
