package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training and encoding semantics, pinned with planted ground truth
  * (the oracle can only check losslessness — BPE-ness lives here).
  */
class BpeTokenizerSpec extends SparkSpec {
  import BpeTokenizer._

  test("training learns the classic merges on the textbook corpus") {
    // 'ab' dominates: the first merge must be (a,b). After it, 'ab'+'</w>'
    // is the most frequent remaining pair in the ab-words.
    val words = Seq(("ab", 10L), ("abc", 4L), ("b", 1L))
    val merges = train(words, numMerges = 2)
    assert(merges.head == ("a", "b"), s"first merge was ${merges.head}")
    assert(merges(1) == ("ab", EndOfWord), s"second merge was ${merges(1)}")
  }

  test("tie-breaks are lexicographic, training is deterministic") {
    // (x,y) and (a,b) both occur exactly twice -> (a,b) must win the tie
    val words = Seq(("xy", 2L), ("ab", 2L))
    val m1 = train(words, numMerges = 1)
    assert(m1.head == ("a", "b"))
    // repeat training is bit-identical
    val big = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    assert(train(big, 50) == train(big, 50))
  }

  test("frequent words collapse to single symbols; encode honors rank order") {
    val words = Seq(("low", 50L), ("lower", 6L), ("newest", 20L), ("wide", 3L))
    val ranks = train(words, 100).zipWithIndex.toMap
    // 'low' is frequent enough to become one symbol (low</w>)
    assert(encodeWord("low", ranks) == Vector("low" + EndOfWord))
    // unseen word still encodes (falls back toward characters) and decodes
    val toks = encodeWord("glowing", ranks)
    assert(decode(toks) == "glowing")
    assert(toks.length > 1, "an unseen word must not collapse to one symbol")
  }

  test("decode∘encode is the whitespace-normalized identity, including edge cases") {
    val words = Seq(("hello", 3L), ("world", 3L))
    val ranks = train(words, 20).zipWithIndex.toMap
    assert(decode(encode("  hello   world ", ranks)) == "hello world")
    assert(decode(encode("", ranks)) == "")
    assert(decode(encode("   ", ranks)) == "")
    assert(decode(encode("héllo wörld 漢字", ranks)) == "héllo wörld 漢字",
      "unseen unicode must round-trip through character fallback")
  }

  test("model persists to the lake; a cold load encodes identically") {
    val cat = graft.lake.LakeCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_bpe").toString)
    val docs = graft.Tables(spark, sfDir).documents
    val ranks = trainOnCorpus(docs, "doc_id", "text", numMerges = 80, sampleDocs = 40)
    saveModel(cat, "models", "bpe", ranks)
    val loaded = loadModel(cat, "models", "bpe")
    assert(loaded == ranks, "round-tripped model must be identical")
    val text = "the quick brown fox jumps over the lazy dog"
    assert(encode(text, loaded) == encode(text, ranks))
  }

  test("distributed encode matches local encode and never exceeds chars+1 per word") {
    import spark.implicits._
    val docs = graft.Tables(spark, sfDir).documents
    val ranks = trainOnCorpus(docs, "doc_id", "text", numMerges = 100, sampleDocs = 50)
    val out = encodeCorpus(docs.limit(50), "doc_id", "text", ranks)
      .select("id", "tokens", "n_tokens").collect()
    val texts = docs.limit(50).select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      val toks = r.getSeq[String](1)
      assert(toks == encode(texts(id), ranks), s"doc $id drifted from local encode")
      val words = texts(id).trim.split("\\s+").filter(_.nonEmpty)
      assert(r.getLong(2) <= words.map(_.length + 1L).sum,
        s"doc $id: BPE emitted more symbols than characters")
      assert(r.getLong(2) >= words.length, s"doc $id: fewer tokens than words")
    }
    // and the learned merges actually compress: total tokens well under
    // total character-fallback symbols
    val totalToks = out.map(_.getLong(2)).sum.toDouble
    val totalChars = texts.values.map(t =>
      t.trim.split("\\s+").filter(_.nonEmpty).map(_.length + 1L).sum).sum.toDouble
    assert(totalToks < totalChars * 0.8,
      f"merges barely compress: $totalToks%.0f vs $totalChars%.0f char symbols")
  }
}
