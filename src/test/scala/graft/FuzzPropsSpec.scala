package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Fuzz, Phonetics}

/** Property-based invariants for the similarity/phonetic kernels
  * (SURVEY.md §5.2.2). Uses scalacheck's runner directly (the
  * scalatest-scalacheck bridge artifact is not in the offline cache). */
class FuzzPropsSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    // fixed seed: the suite gates driver rounds, so a rare unlucky seed must
    // not flake a run — new edge cases get added as explicit vectors instead
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(500)
      .withInitialSeed(org.scalacheck.rng.Seed(20260812L))
    val res = SCTest.check(params, prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  private val nameChar = Gen.frequency(
    (10, Gen.alphaLowerChar), (2, Gen.numChar),
    (1, Gen.oneOf('.', '_', '-', ' ')))
  private val nameStr = Gen.chooseNum(0, 24).flatMap(n => Gen.stringOfN(n, nameChar))

  test("ratio: range, identity, symmetry") {
    check(Prop.forAllNoShrink(nameStr, nameStr) { (a, b) =>
      val r = Fuzz.ratio(a, b)
      r >= 0 && r <= 100 &&
        Fuzz.ratio(a, a) == 100 &&
        r == Fuzz.ratio(b, a)
    })
  }

  test("partial_ratio: range, symmetry, substring containment scores 100") {
    // NB partial_ratio is NOT always >= ratio: the best window's LCS can be
    // far smaller than the full-string LCS even though its denominator is
    // smaller — so the pinned invariants are range, symmetry, containment
    // symmetric only for different lengths: equal-length inputs take the
    // FIRST argument as the sliding pattern (thefuzz semantics)
    check(Prop.forAllNoShrink(nameStr, nameStr) { (a, b) =>
      val p = Fuzz.partialRatio(a, b)
      p >= 0 && p <= 100 &&
        (a.length == b.length || p == Fuzz.partialRatio(b, a))
    })
    check(Prop.forAllNoShrink(nameStr, nameStr, nameStr) { (pre, mid, post) =>
      mid.isEmpty || Fuzz.partialRatio(mid, pre + mid + post) == 100
    })
  }

  test("token_set_ratio: range, symmetry, token-permutation invariance") {
    check(Prop.forAllNoShrink(nameStr, nameStr) { (a, b) =>
      val t = Fuzz.tokenSetRatio(a, b)
      t >= 0 && t <= 100 && t == Fuzz.tokenSetRatio(b, a)
    })
    check(Prop.forAllNoShrink(Gen.listOfN(3, Gen.stringOfN(4, Gen.alphaLowerChar))) { toks =>
      val s = toks.mkString(" ")
      val perm = toks.reverse.mkString(" ")
      toks.distinct.size != toks.size || Fuzz.tokenSetRatio(s, perm) == 100
    })
  }

  test("indel distance is a metric: zero iff equal-ish, triangle inequality") {
    check(Prop.forAllNoShrink(nameStr, nameStr, nameStr) { (a, b, c) =>
      val ab = Fuzz.indelDistance(a, b)
      val bc = Fuzz.indelDistance(b, c)
      val ac = Fuzz.indelDistance(a, c)
      ac <= ab + bc && (ab != 0 || a == b)
    })
  }

  test("soundex: total on the domain, 4 chars on alphabetic input, stable under case") {
    check(Prop.forAllNoShrink(nameStr) { s =>
      val code = Phonetics.soundex(s)
      code != null &&
        Phonetics.soundex(s.toUpperCase) == code &&
        (s.isEmpty || code.nonEmpty)
    })
    check(Prop.forAllNoShrink(Gen.chooseNum(1, 20).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))) { s =>
      Phonetics.soundex(s).length == 4
    })
  }

  test("metaphone: total, case-stable; digits after context-free consonants add nothing") {
    check(Prop.forAllNoShrink(nameStr) { s =>
      val m = Phonetics.metaphone(s)
      m != null && Phonetics.metaphone(s.toUpperCase) == m
    })
    // NB a digit suffix CAN matter after context-sensitive letters (e.g.
    // "ah" -> AH but "ah1" -> A: h-silencing looks at the next char; "xgn" ->
    // silent g but "xgn8" -> K: the gn rule checks end-of-string), so the
    // invariant is stated for the look-ahead-free finals r/l/m/f/j
    check(Prop.forAllNoShrink(
      Gen.stringOfN(6, Gen.alphaLowerChar), Gen.oneOf('r', 'l', 'm', 'f', 'j'),
      Gen.stringOfN(3, Gen.numChar)) { (s, fin, d) =>
      Phonetics.metaphone(s + fin + d) == Phonetics.metaphone(s + fin)
    })
  }
}
