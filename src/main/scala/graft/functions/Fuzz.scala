package graft.functions

/**
 * Fuzzy string-similarity kernels, re-derived from the published semantics of
 * thefuzz/rapidfuzz (the reference's scoring library; see
 * /root/reference/main.py:56-61 and /root/reference/requirements.txt:3).
 *
 * All methods are pure, allocation-light static kernels so that Catalyst
 * codegen can call them directly from generated Java (top-level Scala objects
 * emit static forwarders).
 *
 * Semantics notes (pinned; unit-tested in FuzzSpec):
 *  - `ratio` is the *indel* ratio: `100 * 2*LCS(a,b) / (|a|+|b|)`, half-even
 *    rounded to Int — NOT `100*(1 - editDistance/maxLen)`. Both empty -> 100.
 *  - `partialRatio` takes the max `ratio` of the shorter string against every
 *    alignment window of the longer one (including windows hanging off either
 *    end, per rapidfuzz's alignment range).
 *  - `tokenSetRatio` pre-processes both sides (lowercase; non-alphanumeric ->
 *    space; trim), tokenizes on whitespace, and scores
 *    max(ratio(sect, sect+diffA), ratio(sect, sect+diffB), ratio(c1, c2)).
 */
object Fuzz {

  /** Length of the longest common subsequence; O(|a|*|b|) two-row DP. */
  def llcs(a: CharSequence, b: CharSequence): Int = {
    val m = a.length
    val n = b.length
    if (m == 0 || n == 0) return 0
    // iterate over the shorter string in the inner loop for cache friendliness
    val (s, t) = if (m <= n) (a, b) else (b, a)
    val sl = s.length
    val tl = t.length
    val prev = new Array[Int](sl + 1)
    val curr = new Array[Int](sl + 1)
    var i = 0
    while (i < tl) {
      val tc = t.charAt(i)
      var j = 0
      while (j < sl) {
        curr(j + 1) =
          if (s.charAt(j) == tc) prev(j) + 1
          else math.max(prev(j + 1), curr(j))
        j += 1
      }
      System.arraycopy(curr, 0, prev, 0, sl + 1)
      i += 1
    }
    prev(sl)
  }

  /** Unnormalized indel distance: insertions + deletions only. */
  def indelDistance(a: CharSequence, b: CharSequence): Int =
    a.length + b.length - 2 * llcs(a, b)

  private def rint100(x: Double): Int = math.rint(x).toInt

  /** thefuzz `fuzz.ratio`: half-even-rounded 100*2*LCS/(|a|+|b|). */
  def ratio(a: String, b: String): Int = {
    if (a == null || b == null) return 0
    val lensum = a.length + b.length
    if (lensum == 0) return 100
    if (a == b) return 100
    rint100(200.0 * llcs(a, b) / lensum)
  }

  /** Exact double-precision ratio (used internally by partial/token scorers
    * before the final rounding, mirroring rapidfuzz's float pipeline). */
  def ratioD(a: CharSequence, b: CharSequence): Double = {
    val lensum = a.length + b.length
    if (lensum == 0) return 100.0
    200.0 * llcs(a, b) / lensum
  }

  /** thefuzz `fuzz.partial_ratio`: best window alignment of the shorter
    * string inside the longer one. */
  def partialRatio(a: String, b: String): Int = {
    if (a == null || b == null) return 0
    if (a.length == 0 && b.length == 0) return 100
    if (a.length == 0 || b.length == 0) return 0
    if (a == b) return 100
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    val m = s.length
    val n = l.length
    var best = 0.0
    // alignment range includes partially-overlapping windows at both ends
    var start = -(m - 1)
    while (start <= n - 1 && best < 100.0) {
      val from = math.max(0, start)
      val until = math.min(n, start + m)
      val window = l.subSequence(from, until)
      val sc = ratioD(s, window)
      if (sc > best) best = sc
      start += 1
    }
    rint100(best)
  }

  /** rapidfuzz `default_process`: lowercase, replace non-alphanumerics
    * (incl. '_') with space, trim. */
  def fullProcess(s: String): String = {
    if (s == null) return ""
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetterOrDigit(c)) sb.append(Character.toLowerCase(c))
      else sb.append(' ')
      i += 1
    }
    sb.toString.trim
  }

  private def tokens(processed: String): Array[String] =
    if (processed.isEmpty) Array.empty else processed.split(" +")

  /** thefuzz `fuzz.token_sort_ratio`. */
  def tokenSortRatio(a: String, b: String): Int = {
    val ta = tokens(fullProcess(a)).sorted.mkString(" ")
    val tb = tokens(fullProcess(b)).sorted.mkString(" ")
    if (ta.isEmpty || tb.isEmpty) return 0
    rint100(ratioD(ta, tb))
  }

  /** thefuzz `fuzz.token_set_ratio` (reference main.py:58-61). */
  def tokenSetRatio(a: String, b: String): Int = {
    if (a == null || b == null) return 0
    val ta = tokens(fullProcess(a))
    val tb = tokens(fullProcess(b))
    if (ta.isEmpty || tb.isEmpty) return 0
    val setA = collection.immutable.SortedSet.from(ta)
    val setB = collection.immutable.SortedSet.from(tb)
    val sect = setA.intersect(setB)
    val diffAB = setA.diff(setB)
    val diffBA = setB.diff(setA)
    val sectStr = sect.mkString(" ")
    val combined1 = (sectStr + " " + diffAB.mkString(" ")).trim
    val combined2 = (sectStr + " " + diffBA.mkString(" ")).trim
    if (sect.nonEmpty && (diffAB.isEmpty || diffBA.isEmpty)) return 100
    val r1 = ratioD(sectStr, combined1)
    val r2 = ratioD(sectStr, combined2)
    val r3 = ratioD(combined1, combined2)
    rint100(math.max(r1, math.max(r2, r3)))
  }

  /** Unit-cost Levenshtein distance (for the engine's generic similarity
    * surface; Spark's built-in `levenshtein` matches this). */
  def levenshtein(a: CharSequence, b: CharSequence): Int = {
    val m = a.length
    val n = b.length
    if (m == 0) return n
    if (n == 0) return m
    val prev = new Array[Int](n + 1)
    val curr = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= m) {
      curr(0) = i
      val ac = a.charAt(i - 1)
      var k = 1
      while (k <= n) {
        val cost = if (ac == b.charAt(k - 1)) 0 else 1
        curr(k) = math.min(math.min(curr(k - 1) + 1, prev(k) + 1), prev(k - 1) + cost)
        k += 1
      }
      System.arraycopy(curr, 0, prev, 0, n + 1)
      i += 1
    }
    prev(n)
  }
}
