package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Fuzz, Phonetics, TextAlgos}

/** Unit vectors hand-derived from the published thefuzz/rapidfuzz and
  * jellyfish algorithms (SURVEY.md §5.2.1, FIXTURES.md A5). */
class FuzzSpec extends AnyFunSuite {

  test("ratio: identity, empties, digits") {
    assert(Fuzz.ratio("rajesh", "rajesh") === 100)
    assert(Fuzz.ratio("", "") === 100)
    assert(Fuzz.ratio("abc", "") === 0)
    assert(Fuzz.ratio("", "abc") === 0)
    // LCS("rajesh123","rajesh")=6, lensum=15 -> 200*6/15 = 80
    assert(Fuzz.ratio("rajesh123", "rajesh") === 80)
  }

  test("ratio: indel semantics, not unit-cost levenshtein") {
    // "new york mets" vs "new york meats": LCS=13, lensum=27 -> 96.296 -> 96
    assert(Fuzz.ratio("new york mets", "new york meats") === 96)
    // "abcd" vs "bcde": LCS=3 -> 200*3/8 = 75 (unit-cost lev would give 50)
    assert(Fuzz.ratio("abcd", "bcde") === 75)
    // single substitution in len-11 strings: LCS=10, lensum=22 -> 90.9 -> 91
    assert(Fuzz.ratio("swati.patel", "swati patel") === 91)
  }

  test("ratio: symmetry and half-even rounding") {
    assert(Fuzz.ratio("abcdef", "abdcef") === Fuzz.ratio("abdcef", "abcdef"))
    // LCS("ab","ac")=1, lensum=4 -> 50.0 exact
    assert(Fuzz.ratio("ab", "ac") === 50)
  }

  test("partial_ratio: substring containment scores 100") {
    assert(Fuzz.partialRatio("yankees", "new york yankees") === 100)
    assert(Fuzz.partialRatio("new york yankees", "yankees") === 100)
    assert(Fuzz.partialRatio("", "") === 100)
    assert(Fuzz.partialRatio("", "abc") === 0)
  }

  test("partial_ratio >= ratio") {
    val pairs = Seq(("swati.patel", "swati patel"), ("kul_sanjay", "sanjay kulkarni"),
      ("vtrip_varun", "varun tripathi"), ("testme", "rajesh reddy"))
    pairs.foreach { case (a, b) =>
      assert(Fuzz.partialRatio(a, b) >= Fuzz.ratio(a, b) - 1,
        s"partial($a,$b)=${Fuzz.partialRatio(a, b)} < ratio=${Fuzz.ratio(a, b)}")
    }
  }

  test("token_set_ratio: set semantics ignore order and duplication") {
    assert(Fuzz.tokenSetRatio("fuzzy was a bear", "bear a was fuzzy") === 100)
    assert(Fuzz.tokenSetRatio("fuzzy was a bear", "fuzzy fuzzy was a bear") === 100)
    // separators are stripped by full_process: "." and "_" both -> space
    assert(Fuzz.tokenSetRatio("swati.patel", "swati patel") === 100)
    assert(Fuzz.tokenSetRatio("kul_sanjay", "kul sanjay") === 100)
    // subset relation -> 100 (sect + empty diff)
    assert(Fuzz.tokenSetRatio("patel", "swati patel") === 100)
  }

  test("token_set_ratio: empty-after-processing yields 0") {
    assert(Fuzz.tokenSetRatio("", "abc") === 0)
    assert(Fuzz.tokenSetRatio("...", "abc") === 0)
    assert(Fuzz.tokenSetRatio("", "") === 0)
  }

  test("token_sort_ratio") {
    assert(Fuzz.tokenSortRatio("new york mets vs atlanta braves",
      "atlanta braves vs new york mets") === 100)
  }

  test("levenshtein unit-cost distance") {
    assert(Fuzz.levenshtein("kitten", "sitting") === 3)
    assert(Fuzz.levenshtein("", "abc") === 3)
    assert(Fuzz.levenshtein("abc", "abc") === 0)
  }

  test("soundex: classic vectors") {
    assert(Phonetics.soundex("Robert") === "R163")
    assert(Phonetics.soundex("Rupert") === "R163")
    assert(Phonetics.soundex("Tymczak") === "T522")
    assert(Phonetics.soundex("Pfister") === "P236")
    assert(Phonetics.soundex("Honeyman") === "H555")
    assert(Phonetics.soundex("Ashcraft") === "A261") // H transparent between S and C
  }

  test("soundex: digit-bearing usernames (jellyfish-compatible, not Spark built-in)") {
    assert(Phonetics.soundex("rajesh") === "R220")
    // digits emit no code and break runs; code unchanged here
    assert(Phonetics.soundex("rajesh123") === "R220")
    // digit head is kept verbatim like jellyfish: '1' + s->2, r->6, pad
    assert(Phonetics.soundex("123user") === "1260")
    assert(Phonetics.soundex("") === "")
  }

  test("metaphone: classic vectors") {
    assert(Phonetics.metaphone("jellyfish") === "JLFX")
    assert(Phonetics.metaphone("metaphone") === "MTFN")
    assert(Phonetics.metaphone("discord") === "TSKRT")
    assert(Phonetics.metaphone("xylophone") === "SLFN") // initial x -> s
  }

  test("metaphone: digits emit no code") {
    assert(Phonetics.metaphone("rajesh123") === Phonetics.metaphone("rajesh"))
  }

  test("metaphone: terminal h after a vowel is silent (jellyfish sentinel semantics)") {
    // jellyfish probes past the end with a "*****" sentinel, so end-of-string
    // counts as "no vowel follows" — terminal "ah"/"oh" drop the H (r10 fix;
    // surfaced by the wide synthetic roster's suffixed names)
    assert(Phonetics.metaphone("hannah") === "HN")
    assert(Phonetics.metaphone("hotmoh") === "HTM")
    assert(Phonetics.metaphone("oh") === "O")
    // ...but after a consonant the H is voiced, end-of-string or not
    assert(Phonetics.metaphone("oxh") === "OKSH")
  }

  test("metaphone: digraph partners are consumed (c{iey}, cia, ch, dg{iey})") {
    // jellyfish advances past the digraph's second char, so the consumed
    // vowel/y never re-emits: "cyu" is S-u not S-Y-u, "rodgyu" R-T... -> RJ
    // not RJY, and there is no sch->K special (r10 fixes; the classes are
    // absent from the 17k reference vectors, live in the wide roster)
    assert(Phonetics.metaphone("largecyu") === "LRJS")
    assert(Phonetics.metaphone("rodgyu") === "RJ")
    assert(Phonetics.metaphone("school") === "SXL")
    assert(Phonetics.metaphone("garcia") === "KRX")
  }

  test("simhash/minhash/jaccard sanity") {
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "the quick brown fox jumps over the lazy cat"
    val c = "completely different text with no overlap whatsoever"
    assert(TextAlgos.simhash64(a) === TextAlgos.simhash64(a))
    assert(java.lang.Long.bitCount(TextAlgos.simhash64(a) ^ TextAlgos.simhash64(b)) <
           java.lang.Long.bitCount(TextAlgos.simhash64(a) ^ TextAlgos.simhash64(c)))
    assert(TextAlgos.ngramJaccard(a, a, 3) === 1.0)
    assert(TextAlgos.ngramJaccard(a, c, 3) === 0.0)
    val sigA = TextAlgos.minhash(a, 3, 32)
    val sigB = TextAlgos.minhash(b, 3, 32)
    val agree = sigA.zip(sigB).count { case (x, y) => x == y }
    assert(agree > 8, s"minhash agreement $agree/32 too low for near-dups")
  }

  test("bit-parallel LLCS equals the DP LLCS on random ASCII inputs") {
    val rng = new scala.util.Random(42)
    val alphabet = "abcdefgh._- 0123456789"
    def randStr(maxLen: Int): String =
      Array.fill(rng.nextInt(maxLen + 1))(alphabet(rng.nextInt(alphabet.length))).mkString
    (1 to 2000).foreach { _ =>
      val a = randStr(30); val b = randStr(30)
      val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
      val masks = Fuzz.asciiMasks(s)
      if (s.nonEmpty) {
        assert(Fuzz.llcsBit(s.length, masks, t) === Fuzz.llcsDp(s, t),
          s"llcs mismatch for '$a' vs '$b'")
      }
    }
  }

  test("langId: english vs non-latin") {
    assert(TextAlgos.langId("the quick brown fox is on the table and it is fast") === "en")
    assert(TextAlgos.langId("") === "unknown")
  }
}
