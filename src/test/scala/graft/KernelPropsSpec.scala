package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorMath

/** Property pins for the round-11 kernels (Morton interleave, PQ
  * encode/ADC) — algebraic laws checked against independent in-test
  * re-computations, the same regime as FuzzPropsSpec. Pure JVM, no Spark
  * session. */
class KernelPropsSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    // fixed seed, same rationale as FuzzPropsSpec: driver rounds must not
    // flake on a rare seed — new edge cases become explicit vectors
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(500)
      .withInitialSeed(org.scalacheck.rng.Seed(20260814L))
    val res = SCTest.check(params, prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  private val bitsGen = Gen.chooseNum(1, 31)
  private val longGen = Gen.chooseNum(0L, Long.MaxValue)

  test("zorder2 is a bijection on masked inputs: deinterleave recovers both dims") {
    def deinterleave(z: Long, bits: Int): (Long, Long) = {
      var a = 0L; var b = 0L
      var i = 0
      while (i < bits) {
        a |= ((z >>> (2 * i)) & 1L) << i
        b |= ((z >>> (2 * i + 1)) & 1L) << i
        i += 1
      }
      (a, b)
    }
    check(Prop.forAllNoShrink(longGen, longGen, bitsGen) { (a, b, bits) =>
      val mask = (1L << bits) - 1
      val z = VectorMath.zorder2(a, b, bits)
      deinterleave(z, bits) == ((a & mask, b & mask)) &&
        z >= 0 && (bits == 31 || z < (1L << (2 * bits)))
    })
  }

  test("zorder2 prefix property: dropping 2k low bits interleaves the shifted dims") {
    // the law behind min-max pruning: a z-range prefix IS a (A, B) quadrant
    check(Prop.forAllNoShrink(longGen, longGen, Gen.chooseNum(2, 31),
      Gen.chooseNum(1, 30)) { (a, b, bits, k0) =>
      val k = math.min(k0, bits - 1)
      val mask = (1L << bits) - 1
      (VectorMath.zorder2(a, b, bits) >>> (2 * k)) ==
        VectorMath.zorder2((a & mask) >>> k, (b & mask) >>> k, bits - k)
    })
  }

  test("zorderN at d=2 is bit-for-bit zorder2 (the pinned 2-d oracle form)") {
    check(Prop.forAllNoShrink(longGen, longGen, bitsGen) { (a, b, bits) =>
      VectorMath.zorderN(Array(a, b), bits) == VectorMath.zorder2(a, b, bits)
    })
  }

  test("zorderN is a bijection on masked inputs for 2-4 dims") {
    def deinterleaveN(z: Long, d: Int, bits: Int): Seq[Long] =
      (0 until d).map { j =>
        var x = 0L
        var i = 0
        while (i < bits) { x |= ((z >>> (i * d + j)) & 1L) << i; i += 1 }
        x
      }
    val dGen = Gen.chooseNum(2, 4)
    check(Prop.forAllNoShrink(dGen, Gen.listOfN(4, longGen)) { (d, vs0) =>
      val bits = 63 / d
      val mask = (1L << bits) - 1
      val vs = vs0.take(d).toArray
      val z = VectorMath.zorderN(vs, bits)
      z >= 0 && deinterleaveN(z, d, bits) == vs.map(_ & mask).toSeq
    })
  }

  test("zorderN prefix property: dropping d*k low bits interleaves the shifted dims") {
    // the data-skipping law in any dimension count: a z-range prefix IS a
    // d-dimensional box (each dim coarsened by k bits)
    check(Prop.forAllNoShrink(Gen.chooseNum(2, 4), Gen.listOfN(4, longGen),
      Gen.chooseNum(1, 14)) { (d, vs0, k0) =>
      val bits = 63 / d
      val k = math.min(k0, bits - 1)
      val mask = (1L << bits) - 1
      val vs = vs0.take(d).toArray
      (VectorMath.zorderN(vs, bits) >>> (d * k)) ==
        VectorMath.zorderN(vs.map(v => (v & mask) >>> k), bits - k)
    })
  }

  private val dim = 16
  private val m = 4
  private val ksub = 4
  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(dim, Gen.chooseNum(-5.0f, 5.0f)).map(_.toArray)
  private val booksGen: Gen[Array[Array[Array[Double]]]] =
    Gen.listOfN(m * ksub * (dim / m), Gen.chooseNum(-1.0, 1.0)).map { flat =>
      Array.tabulate(m)(j => Array.tabulate(ksub)(c =>
        flat.slice((j * ksub + c) * (dim / m), (j * ksub + c + 1) * (dim / m)).toArray))
    }

  private def norm(v: Array[Float]): Array[Double] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    v.map(_.toDouble / n)
  }

  test("pqEncode picks the per-subspace distance minimizer (first on ties)") {
    check(Prop.forAllNoShrink(vecGen, booksGen) { (v, books) =>
      val nv = norm(v)
      val sub = dim / m
      val codes = VectorMath.pqEncode(v, books).toIntArray()
      (0 until m).forall { j =>
        def d(c: Int) = (0 until sub).map { i =>
          val t = nv(j * sub + i) - books(j)(c)(i); t * t
        }.sum
        val chosen = d(codes(j))
        (0 until ksub).forall(c => chosen <= d(c)) &&
          (0 until codes(j)).forall(c => d(c) > chosen) // strict: first min wins
      }
    })
  }

  test("pqAdc equals the dot of the normalized query with the PQ reconstruction") {
    check(Prop.forAllNoShrink(vecGen, vecGen, booksGen) { (x, q, books) =>
      val sub = dim / m
      val codes = VectorMath.pqEncode(x, books)
      val tables = VectorMath.pqAdcTables(q, books)
      val adc = VectorMath.pqAdc(tables, codes)
      // independent recomputation: reconstruction = concat of chosen codewords
      val qn = norm(q)
      val want = (0 until m).map { j =>
        val cw = books(j)(codes.getInt(j))
        (0 until sub).map(i => qn(j * sub + i) * cw(i)).sum
      }.sum
      math.abs(adc - want) < 1e-9
    })
  }

  test("zero-norm and empty vectors refuse to encode (null, not garbage)") {
    check(Prop.forAllNoShrink(booksGen) { books =>
      VectorMath.pqEncode(Array.fill(dim)(0.0f), books) == null &&
        VectorMath.pqAdcTables(Array.fill(dim)(0.0f), books) == null
    })
  }

  private val centsGen: Gen[Array[(Long, Array[Float])]] = for {
    nc <- Gen.chooseNum(1, 24)
    // non-consecutive, unordered ids: the kernel must not assume either
    ids <- Gen.listOfN(nc, Gen.chooseNum(0L, 1000L)).map(_.distinct)
    vecs <- Gen.listOfN(ids.length, vecGen)
  } yield ids.zip(vecs).toArray

  test("nearestCentroids equals a full sort by (-cosine, cid) truncated to n") {
    check(Prop.forAllNoShrink(vecGen, centsGen, Gen.chooseNum(1, 8)) { (v, cents, n) =>
      val got = VectorMath.nearestCentroids(
        v, cents.map(_._1), cents.map(_._2), n).toLongArray().toSeq
      val want = cents.toSeq
        .map { case (cid, cv) => (-VectorMath.cosine(v, cv), cid) }
        .sortWith { case ((na, ia), (nb, ib)) =>
          val c = java.lang.Double.compare(na, nb)
          c < 0 || (c == 0 && ia < ib)
        }
        .take(n).map(_._2)
      got == want
    })
  }

  test("nearestCentroids ties break to the smallest centroid id") {
    // duplicate centroid vectors -> identical cosines -> cid ASC decides;
    // zero-norm input -> every cosine is 0.0 -> pure cid order
    check(Prop.forAllNoShrink(vecGen, vecGen, Gen.chooseNum(1, 4)) { (v, cv, n) =>
      val cents = Array((7L, cv), (3L, cv), (11L, cv), (5L, cv))
      val dup = VectorMath.nearestCentroids(v, cents.map(_._1), cents.map(_._2), n)
        .toLongArray().toSeq
      val zero = VectorMath.nearestCentroids(
        Array.fill(dim)(0.0f), cents.map(_._1), cents.map(_._2), n).toLongArray().toSeq
      dup == Seq(3L, 5L, 7L, 11L).take(n) && zero == Seq(3L, 5L, 7L, 11L).take(n)
    })
  }

  test("cosine stays in [-1, 1] and is 1 on self for nonzero vectors") {
    check(Prop.forAllNoShrink(vecGen, vecGen) { (a, b) =>
      val c = VectorMath.cosine(a, b)
      val selfOk = VectorMath.l2(a) == 0.0 ||
        math.abs(VectorMath.cosine(a, a) - 1.0) < 1e-9
      c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 && selfOk
    })
  }

  // r20: TextAlgos.tokens dropped its per-call regex Pattern; pin exact
  // equivalence with the original `toLowerCase.split("\\s+").filter
  // (_.nonEmpty)` form over whitespace-heavy and non-ASCII inputs
  test("TextAlgos.tokens == the regex split form it replaced") {
    val wsChars = Seq(' ', '\t', '\n', '\u000B', '\f', '\r')
    val piece = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(wsChars).map(_.toString),
      Gen.oneOf("Ärger", "ΣΙΣΥΦΟΣ", "İstanbul", "a_b-c", "", "  ", "x y"))
    val textGen = Gen.listOf(piece).map(_.mkString)
    check(Prop.forAllNoShrink(textGen) { text =>
      val viaRegex: Seq[String] =
        if (text.isEmpty) Seq.empty
        else text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      graft.functions.TextAlgos.tokens(text).toSeq == viaRegex
    })
  }

  // r20: shingleSet dropped the boxing Array.distinct and the verify legs
  // replaced size(array_intersect) with a sorted-merge count — pin both
  // against their set-semantics reference forms
  test("TextAlgos.shingleSet == sorted distinct of shingles") {
    import graft.functions.TextAlgos
    val textGen = Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.const(" "), Gen.const("dup word "))).map(_.mkString)
    check(Prop.forAllNoShrink(textGen, Gen.chooseNum(1, 4)) { (text, w) =>
      val expected = TextAlgos.shingles(text, w).distinct.sorted.toSeq
      TextAlgos.shingleSet(text, w).toSeq == expected
    })
  }

  test("TextAlgos.sortedIntersectCount == set-intersection cardinality") {
    import graft.functions.TextAlgos
    val setGen = Gen.listOf(Gen.chooseNum(-20L, 20L))
      .map(_.distinct.sorted.toArray)
    check(Prop.forAllNoShrink(setGen, setGen) { (a, b) =>
      TextAlgos.sortedIntersectCount(a, b) == a.toSet.intersect(b.toSet).size
    })
  }

  test("TextAlgos.ngramJaccard == the Scala-Set form it replaced") {
    import graft.functions.TextAlgos
    val textGen = Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(5)),
      Gen.const(" "), Gen.const("shared phrase "))).map(_.mkString)
    check(Prop.forAllNoShrink(textGen, textGen, Gen.chooseNum(1, 4)) { (a, b, w) =>
      val sa = TextAlgos.shingles(a, w).toSet
      val sb = TextAlgos.shingles(b, w).toSet
      val expected =
        if (sa.isEmpty && sb.isEmpty) 1.0
        else if (sa.isEmpty || sb.isEmpty) 0.0
        else {
          val inter = sa.intersect(sb).size
          inter.toDouble / (sa.size + sb.size - inter)
        }
      TextAlgos.ngramJaccard(a, b, w) == expected
    })
  }

  test("TextAlgos.shingles == fnv1a64 over slice-and-mkString windows") {
    import graft.functions.TextAlgos
    val textGen = Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.const(" "), Gen.const("\tword "))).map(_.mkString)
    check(Prop.forAllNoShrink(textGen, Gen.chooseNum(1, 4)) { (text, w) =>
      val ts = TextAlgos.tokens(text)
      val expected: Seq[Long] =
        if (ts.length < w) {
          if (ts.isEmpty) Seq.empty
          else Seq(TextAlgos.fnv1a64(ts.mkString(" ")))
        } else (0 to ts.length - w).map(i =>
          TextAlgos.fnv1a64(ts.slice(i, i + w).mkString(" ")))
      TextAlgos.shingles(text, w).toSeq == expected
    })
  }
}
