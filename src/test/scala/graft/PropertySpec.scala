package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks (ScalaCheck driven from ScalaTest) for the
  * pure-JVM kernels whose correctness claims are universal, not
  * example-shaped: BPE round-trips, OOXML round-trips, UTF-8 stats
  * ordering, and the z-order bit interleave. Each runs a few hundred
  * random cases per CI pass — the cheap fuzzing layer under the
  * planted-ground-truth specs.
  */
class PropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private def check(prop: Prop, min: Int = 200): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(r.passed, r.status.toString)
  }

  // printable-ish text WITHOUT the BPE end-of-word marker (reserved) and
  // with realistic whitespace mixes
  private val wordGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('é', 'ß', '漢', 'ق', '√', '-', '_', '.', ','))).map(_.mkString)
  private val textGen: Gen[String] = for {
    words <- Gen.listOfN(8, wordGen)
    seps <- Gen.listOfN(8, Gen.oneOf(" ", "  ", "\t", "\n", " \t "))
    lead <- Gen.oneOf("", " ", "\n")
  } yield lead + words.zip(seps).map { case (w, s) => w + s }.mkString

  test("lake stream Pos: offset encoding round-trips and the order is a strict total order") {
    import org.apache.spark.sql.graft.LakeStreamSource.{Pos, SlicedOffset}
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val posGen: Gen[Pos] = for {
      v <- Gen.chooseNum(0, 1000000)
      d <- Gen.oneOf(Gen.const(-1), Gen.chooseNum(0, 100000))
      snap <- Gen.oneOf(true, false)
    } yield Pos(v, d, if (d < 0) false else snap)
    // parse(render(p)) == p for both encodings (plain long when complete)
    check(Prop.forAll(posGen) { p =>
      val json = if (p.d < 0) LongOffset(p.v.toLong).json else SlicedOffset(p).json
      Pos.parse(json) == p
    })
    // strict total order: antisymmetric + transitive + complete(v) above
    // every cursor at v, below everything at v+1
    check(Prop.forAll(posGen, posGen, posGen) { (a, b, c) =>
      val anti = math.signum(a.compare(b)) == -math.signum(b.compare(a))
      val trans = !(a.compare(b) <= 0 && b.compare(c) <= 0) || a.compare(c) <= 0
      anti && trans
    })
    check(Prop.forAll(posGen) { p =>
      val full = Pos(p.v, -1, snap = false)
      val nextV = Pos(p.v + 1, 0, snap = false)
      (p.d < 0 || p.compare(full) < 0) && full.compare(nextV) < 0
    })
  }

  test("BPE: decode∘encode == whitespace-normalized identity for arbitrary text/models") {
    import graft.operators.BpeTokenizer._
    val corpusGen = Gen.listOfN(20, Gen.zip(wordGen, Gen.choose(1L, 30L)))
    check(Prop.forAll(corpusGen, textGen) { (corpus, text) =>
      val ranks = train(corpus, numMerges = 40).zipWithIndex.toMap
      val normalized = text.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      decode(encode(text, ranks)) == normalized
    })
  }

  test("BPE: training is deterministic and merges strictly shrink sample segmentations") {
    import graft.operators.BpeTokenizer._
    val corpusGen = Gen.nonEmptyListOf(Gen.zip(wordGen, Gen.choose(2L, 50L)))
    check(Prop.forAll(corpusGen) { corpus =>
      val m1 = train(corpus, 30); val m2 = train(corpus, 30)
      val ranks = m1.zipWithIndex.toMap
      m1 == m2 && corpus.forall { case (w, _) =>
        val toks = encodeWord(w, ranks)
        toks.nonEmpty && toks.length <= w.length + 1
      }
    }, min = 100)
  }

  test("DOCX: paragraphs(docxBytes(ps)) == ps for arbitrary paragraph lists") {
    import graft.sources.DocxReader
    // XML-significant characters included deliberately (escaping is the
    // part most likely to be wrong); control chars excluded (invalid XML)
    val paraGen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 1 -> Gen.oneOf('&', '<', '>', '"', '\''),
      1 -> Gen.oneOf(' ', '\t', 'é', '漢'))).map(_.mkString)
    check(Prop.forAll(Gen.listOfN(5, paraGen)) { ps =>
      DocxReader.paragraphs(DocxReader.docxBytes(ps)) == ps
    })
  }


}
