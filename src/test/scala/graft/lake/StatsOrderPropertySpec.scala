package graft.lake

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property check for the UTF-8 stats ordering (lives in graft.lake for
  * access to the private[lake] object). See graft.PropertySpec for the
  * rest of the property layer.
  */
class StatsOrderPropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  test("StatsOrder: utf8 order is a total order agreeing with byte-wise truth") {
    import graft.lake.StatsOrder
    val sGen = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('\uE000', '\uFFFD', '\u00E9', '\u6F22'),
      1 -> Gen.oneOf("\uD834\uDD1E", "\uD83D\uDE42").map(_.charAt(0)) // lone surrogates stress UTF-8
    )).map(_.mkString)
    check(Prop.forAll(sGen, sGen, sGen) { (a, b, c) =>
      val ab = StatsOrder.utf8Compare(a, b)
      val antisym = Integer.signum(ab) == -Integer.signum(StatsOrder.utf8Compare(b, a))
      val trans = !(StatsOrder.lt(a, b) && StatsOrder.lt(b, c)) || StatsOrder.lt(a, c)
      val consistent = StatsOrder.leq(a, b) == (ab <= 0) && StatsOrder.geq(a, b) == (ab >= 0)
      antisym && trans && consistent
    })
  }
}
