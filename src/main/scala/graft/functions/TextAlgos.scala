package graft.functions

/**
 * Deterministic text kernels for the large-scale-pipeline surface
 * (dedup / fingerprinting / language-ID / quality scoring). All are pure
 * static functions so they can be invoked from codegen'd expressions and
 * remain bit-stable across JVMs — a hard requirement when the same document
 * must hash to the same bucket on 1000 executors.
 */
object TextAlgos {

  /** 64-bit FNV-1a — stable, dependency-free hash for shingles/fingerprints. */
  def fnv1a64(s: CharSequence): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  // Java regex \s = exactly [ \t\n\x0B\f\r] (no UNICODE_CHARACTER_CLASS)
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Whitespace tokens of the lowercased text.
    *
    * Hand-rolled splitter (r20): the former `split("\\s+")` compiled a
    * regex Pattern PER CALL, and this kernel sits under every shingle /
    * minhash / simhash / n-gram path — the same per-call-Pattern cost the
    * fuzzy kernels shed (guide §1.2). Equivalence is exact: `\s` is the
    * ASCII class [ \t\n\x0B\f\r] and the old `.filter(_.nonEmpty)`
    * discarded the empty leading element a whitespace-prefixed string
    * produces, so "non-empty runs between ASCII whitespace" is the same
    * token array (KernelPropsSpec cross-checks against the regex form). */
  def tokens(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val lower = text.toLowerCase
    val len = lower.length
    var n = 0
    var i = 0
    var inTok = false
    while (i < len) {
      val w = isWs(lower.charAt(i))
      if (!w && !inTok) n += 1
      inTok = !w
      i += 1
    }
    if (n == 0) return Array.empty
    val out = new Array[String](n)
    var k = 0
    var from = -1
    i = 0
    while (i <= len) {
      if (i == len || isWs(lower.charAt(i))) {
        if (from >= 0) { out(k) = lower.substring(from, i); k += 1; from = -1 }
      } else if (from < 0) from = i
      i += 1
    }
    out
  }

  /** Word n-grams as STRINGS — the exact kernel twin of the
    * `lower → \s+ split → n-windows joined by ' '` Column form
    * (TextAnalysis.gramArray): fewer than n tokens → empty (no partial
    * gram), duplicates preserved in order. One pass, one StringBuilder —
    * replaces a transform/slice/array_join HOF chain whose per-element
    * Catalyst overhead dominated the contamination/boilerplate scans. */
  def ngrams(text: String, n: Int): Array[String] = {
    val ts = tokens(text)
    if (ts.length < n) Array.empty
    else {
      val out = new Array[String](ts.length - n + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= ts.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ts(i + j))
          j += 1
        }
        out(i) = sb.toString
        i += 1
      }
      out
    }
  }

  /** [[ngrams]] pre-wrapped as UTF8String elements for ArrayData (the
    * codegen bridge for the NgramArray expression). */
  def ngramsUtf8(text: String, n: Int): Array[AnyRef] = {
    val gs = ngrams(text, n)
    val out = new Array[AnyRef](gs.length)
    var i = 0
    while (i < gs.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(gs(i))
      i += 1
    }
    out
  }

  /** FNV-1a of the ' '-joined token window [from, from+w) — the exact char
    * stream `fnv1a64(ts.slice(from, from+w).mkString(" "))` hashes, without
    * materializing the slice array and the joined string per window (r20:
    * two allocations per shingle on every document). */
  private def fnv1a64Window(ts: Array[String], from: Int, w: Int): Long = {
    var h = 0xcbf29ce484222325L
    var j = 0
    while (j < w) {
      if (j > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
      val t = ts(from + j)
      var i = 0
      while (i < t.length) {
        h ^= t.charAt(i).toLong
        h *= 0x100000001b3L
        i += 1
      }
      j += 1
    }
    h
  }

  /** Word-level w-shingles as stable 64-bit hashes. */
  def shingles(text: String, w: Int): Array[Long] = {
    val ts = tokens(text)
    if (ts.length < w) {
      if (ts.isEmpty) Array.empty else Array(fnv1a64Window(ts, 0, ts.length))
    } else {
      val out = new Array[Long](ts.length - w + 1)
      var i = 0
      while (i + w <= ts.length) {
        out(i) = fnv1a64Window(ts, i, w)
        i += 1
      }
      out
    }
  }

  /**
   * MinHash signature of `k` permutations over the word-shingle set.
   * Permutation i is `mix64(h ^ seed_i)` — the standard "one hash, k
   * xor-mix-seeds" construction (Broder '97 family).
   */
  def minhash(text: String, w: Int, k: Int): Array[Long] = {
    val sh = shingles(text, w)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val base = sh(i)
      var j = 0
      while (j < k) {
        val v = mix64(base ^ (0x9e3779b97f4a7c15L * (j + 1)))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band keys: hash of each band of `rowsPerBand` signature slots.
    * Two docs sharing any band key are near-dup candidates. */
  def lshBands(sig: Array[Long], rowsPerBand: Int): Array[Long] = {
    val nBands = sig.length / rowsPerBand
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = 0xcbf29ce484222325L ^ b
      var r = 0
      while (r < rowsPerBand) {
        h = (h ^ sig(b * rowsPerBand + r)) * 0x100000001b3L
        r += 1
      }
      out(b) = h
      b += 1
    }
    out
  }

  /** 64-bit SimHash over word-level features (Charikar 2002). */
  def simhash64(text: String): Long = {
    val ts = tokens(text)
    if (ts.isEmpty) return 0L
    val acc = new Array[Int](64)
    var i = 0
    while (i < ts.length) {
      val h = mix64(fnv1a64(ts(i)))
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (acc(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Distinct word w-shingles, ascending — the SET form of [[shingles]].
    * Prefix-filter dedup ([[graft.operators.Dedup.ngramJaccardPairs]])
    * explodes it to narrow (id, shingle) rows; sorting makes the array
    * itself deterministic for spec pins and oracle dumps. */
  def shingleSet(text: String, w: Int): Array[Long] = {
    val sh = shingles(text, w)
    if (sh.length <= 1) sh
    else {
      // sort-then-dedupe-adjacent, in place: [[shingles]] allocates a fresh
      // array per call, and Array[Long].distinct boxes every element into a
      // HashSet — same sorted distinct values, one allocation, no boxing
      java.util.Arrays.sort(sh)
      var n = 1
      var i = 1
      while (i < sh.length) {
        if (sh(i) != sh(n - 1)) { sh(n) = sh(i); n += 1 }
        i += 1
      }
      if (n == sh.length) sh else java.util.Arrays.copyOf(sh, n)
    }
  }

  /** |a ∩ b| of two SORTED distinct long arrays ([[shingleSet]] outputs):
    * one merge pass, no hash set, no intersection array — the per-pair
    * kernel behind the dedup verify legs, where Spark's `array_intersect`
    * built a hash relation and materialized the intersection per row only
    * for `size()` to count it. */
  def sortedIntersectCount(a: Array[Long], b: Array[Long]): Int = {
    var i = 0
    var j = 0
    var n = 0
    while (i < a.length && j < b.length) {
      val x = a(i)
      val y = b(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }

  /** Jaccard similarity of word w-shingle sets (exact, for oracle-able
    * pairwise checks and as the MinHash ground truth). Merge-counted over
    * the sorted [[shingleSet]] forms — |set| and |intersection| are the
    * same numbers the old Scala-Set formulation produced. */
  def ngramJaccard(a: String, b: String, w: Int): Double = {
    val sa = shingleSet(a, w)
    val sb = shingleSet(b, w)
    if (sa.isEmpty && sb.isEmpty) return 1.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    val inter = sortedIntersectCount(sa, sb)
    inter.toDouble / (sa.length + sb.length - inter)
  }

  /** Rolling (Rabin-Karp style, base 257 mod 2^61-1) document fingerprint:
    * min of window hashes — robust to small edits at window granularity. */
  def rollingFingerprint(text: String, window: Int): Long = {
    if (text == null || text.isEmpty) return 0L
    val n = text.length
    if (n <= window) return fnv1a64(text)
    val Mod = (1L << 61) - 1
    val Base = 257L
    def mulmod(a: Long, b: Long): Long = {
      // 61-bit modulus keeps a*b within unsigned 122 bits; use Math.multiplyHigh
      val hi = Math.multiplyHigh(a, b)
      val lo = a * b
      // fold 2^64 ≡ 2^3 (mod 2^61-1)
      var r = (lo & Mod) + ((lo >>> 61) | (hi << 3) & Mod) + (hi >>> 58)
      while (r >= Mod) r -= Mod
      r
    }
    var pow = 1L
    var i = 0
    while (i < window - 1) { pow = mulmod(pow, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < window) { h = (mulmod(h, Base) + text.charAt(i)) % Mod; i += 1 }
    var minH = mix64(h)
    i = window
    while (i < n) {
      h = (h - mulmod(text.charAt(i - window), pow) % Mod + Mod) % Mod
      h = (mulmod(h, Base) + text.charAt(i)) % Mod
      val m = mix64(h)
      if (m < minH) minH = m
      i += 1
    }
    minH
  }

  /** The ONE English stopword list — shared by the langId/stopwordRatio
    * kernels and TextAnalysis's Column-side stopword_ratio so the two
    * surfaces cannot drift apart. */
  val EnglishStopwords: Set[String] = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "by", "at", "from", "this", "be", "are", "was")

  /** Unicode normalization via `java.text.Normalizer` — the
    * canonicalization step that runs before dedup/fingerprinting so the
    * same text in composed vs decomposed (or compatibility-variant) form
    * hashes identically. `form` is NFC | NFD | NFKC | NFKD; an unknown
    * form throws IllegalArgumentException at first evaluation. Bit-stable:
    * the JDK implements the Unicode-specified normalization algorithm. */
  def unicodeNormalize(s: String, form: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form))

  /** Heuristic language ID: character-class + stopword-ratio n-gram
    * heuristic. Deterministic; returns ISO-ish codes or "unknown". */
  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "unknown"
    var latin = 0; var cjk = 0; var cyr = 0; var arab = 0; var dev = 0; var total = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        total += 1
        val blk = Character.UnicodeScript.of(c)
        blk match {
          case Character.UnicodeScript.LATIN => latin += 1
          case Character.UnicodeScript.HAN | Character.UnicodeScript.HIRAGANA |
               Character.UnicodeScript.KATAKANA | Character.UnicodeScript.HANGUL => cjk += 1
          case Character.UnicodeScript.CYRILLIC => cyr += 1
          case Character.UnicodeScript.ARABIC => arab += 1
          case Character.UnicodeScript.DEVANAGARI => dev += 1
          case _ => ()
        }
      }
      i += 1
    }
    if (total == 0) return "unknown"
    if (cjk * 2 > total) return "zh"
    if (cyr * 2 > total) return "ru"
    if (arab * 2 > total) return "ar"
    if (dev * 2 > total) return "hi"
    if (latin * 2 > total) {
      val ts = tokens(text)
      if (ts.isEmpty) return "unknown"
      var sw = 0
      var j = 0
      while (j < ts.length) { if (EnglishStopwords.contains(ts(j))) sw += 1; j += 1 }
      if (sw.toDouble / ts.length >= 0.08) "en" else "latin-other"
    } else "unknown"
  }

  /** Stopword ratio over whitespace tokens (quality-scoring feature). */
  def stopwordRatio(text: String): Double = {
    val ts = tokens(text)
    if (ts.isEmpty) return 0.0
    var sw = 0
    var j = 0
    while (j < ts.length) { if (EnglishStopwords.contains(ts(j))) sw += 1; j += 1 }
    sw.toDouble / ts.length
  }
}
