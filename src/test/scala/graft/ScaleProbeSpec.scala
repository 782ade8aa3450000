package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins ScaleProbe's section-name validation: a typo'd section must fail
  * loudly instead of running zero sections and exiting 0.
  */
class ScaleProbeSpec extends AnyFunSuite {

  test("unknown section names are rejected with the known list in the message") {
    val e = intercept[IllegalArgumentException](
      ScaleProbe.validateSections(Set("minhash", "skw")))
    assert(e.getMessage.contains("skw"))
    assert(e.getMessage.contains("skew"), "message must list the known sections")
  }

  test("known names and the empty (run-everything) set validate unchanged") {
    assert(ScaleProbe.validateSections(Set.empty) == Set.empty)
    assert(ScaleProbe.validateSections(Set("minhash", "skew")) == Set("minhash", "skew"))
    assert(ScaleProbe.validateSections(ScaleProbe.knownSections) == ScaleProbe.knownSections)
  }
}
