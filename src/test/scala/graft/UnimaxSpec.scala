package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class UnimaxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  import SparkTestBase.Sf0001

  /** Reference waterfill: iterate "give everyone the uniform share of the
    * remaining budget; freeze anyone whose cap is below it" to a fixed
    * point — the textbook algorithm the closed form must reproduce. */
  private def referenceWaterfill(caps: Seq[Long], budget: Double): Seq[Double] = {
    val alloc = Array.fill(caps.size)(Double.NaN)
    var remaining = budget
    var open = caps.indices.toSet
    var changed = true
    while (changed && open.nonEmpty) {
      changed = false
      val share = remaining / open.size
      val sat = open.filter(i => caps(i) <= share)
      if (sat.nonEmpty) {
        sat.foreach { i => alloc(i) = caps(i).toDouble; remaining -= caps(i) }
        open = open -- sat
        changed = true
      }
    }
    if (open.nonEmpty) {
      val share = remaining / open.size
      open.foreach(alloc(_) = share)
    }
    alloc.toSeq
  }

  private def docs = spark.read.parquet(s"$Sf0001/documents.parquet")

  test("closed-form allocation equals the iterative waterfill on real sources") {
    val out = TextAnalysis.unimaxAllocation(docs, "text", col("source"),
        budgetFrac = 1.5, maxEpochs = 2)
      .select("stratum", "n_tokens", "cap", "alloc_tokens")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val total = out.map(_._2).sum
    val want = referenceWaterfill(out.map(_._3), 1.5 * total.toDouble)
    out.zip(want).foreach { case ((s, _, cap, got), ref) =>
      assert(math.abs(got - ref) < 1e-6, s"stratum $s: $got vs reference $ref")
      assert(got <= cap.toDouble + 1e-6, s"stratum $s exceeds its cap")
    }
    // conservation: every allocated token is accounted for (no stratum
    // saturation pattern loses budget) unless everything saturated
    val spent = out.map(_._4).sum
    val capsTotal = out.map(_._3.toDouble).sum
    assert(math.abs(spent - math.min(1.5 * total.toDouble, capsTotal)) < 1e-6)
  }

  test("budget >= all caps: every stratum saturates at exactly maxEpochs") {
    val out = TextAnalysis.unimaxAllocation(docs, "text", col("source"),
        budgetFrac = 5.0, maxEpochs = 2)
      .select("saturated", "alloc_tokens", "epochs", "cap")
      .as[(Boolean, Double, Double, Long)].collect()
    assert(out.forall(_._1), "all strata must saturate")
    out.foreach { case (_, alloc, epochs, cap) =>
      assert(alloc === cap.toDouble)
      assert(math.abs(epochs - 2.0) < 1e-12)
    }
  }

  test("unreachable caps: pure uniform split, budget/D each") {
    val out = TextAnalysis.unimaxAllocation(docs, "text", col("source"),
        budgetFrac = 0.5, maxEpochs = 1000)
      .select("n_tokens", "saturated", "alloc_tokens")
      .as[(Long, Boolean, Double)].collect()
    val total = out.map(_._1).sum
    val share = 0.5 * total.toDouble / out.length
    // per-source tokens are near-uniform in the fixture, so no cap can sit
    // below the 0.5x share at 1000 epochs
    assert(out.forall(!_._2))
    out.foreach(r => assert(math.abs(r._3 - share) < 1e-9))
  }

  test("skewed synthetic strata: tiny stratum saturates, leftovers stay even") {
    val df = (Seq.fill(50)("src_big") ++ Seq.fill(2)("src_tiny")).zipWithIndex
      .map { case (s, i) => (i.toLong, "w1 w2 w3 w4 w5", s) }
      .toDF("doc_id", "text", "source")
    // tokens: big = 250, tiny = 10; caps x2 = 500 / 20; budget = 1.5x260 = 390
    // tiny saturates (20 <= 390/2=195); big gets 370
    val rows = TextAnalysis.unimaxAllocation(df, "text", col("source"),
        budgetFrac = 1.5, maxEpochs = 2)
      .select("stratum", "saturated", "alloc_tokens", "epochs")
      .as[(String, Boolean, Double, Double)].collect().sortBy(_._1)
    assert(rows(0)._1 === "src_big" && !rows(0)._2 && rows(0)._3 === 370.0)
    assert(rows(1)._1 === "src_tiny" && rows(1)._2 && rows(1)._3 === 20.0)
    assert(math.abs(rows(1)._4 - 2.0) < 1e-12)
  }

  test("temperature mix: exact sqrt weights and hand-computed allocation") {
    // big = 10000 tokens across 100 docs, small = 100 tokens in 10 docs
    val df = ((1 to 100).map(i => (i.toLong, Seq.fill(100)("w").mkString(" "), "big"))
        ++ (101 to 110).map(i => (i.toLong, Seq.fill(10)("w").mkString(" "), "small")))
      .toDF("doc_id", "text", "source")
    val rows = TextAnalysis.temperatureMix(df, "text", col("source"),
        budgetTokens = 1100L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // w = floor(sqrt(10000)) = 100, floor(sqrt(100)) = 10; total 110
    assert(rows("big") === (("big", 100L, 10000L, 100L, 1000L, 1000L * 1048576 / 10000)))
    assert(rows("small") === (("small", 10L, 100L, 10L, 100L, 100L * 1048576 / 100)))
  }

  test("temperature mix flattens: low-resource share rises, head share falls") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val budget = 1000000L
    val rows = TextAnalysis.temperatureMix(docs, "text", col("source"), budget)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._5).sum <= budget, "floor-division allocation never overshoots")
    val total = rows.map(_._3).sum.toDouble
    val smallest = rows.minBy(_._3)
    val largest = rows.maxBy(_._3)
    assert(smallest._5.toDouble / budget >= smallest._3 / total - 1e-9,
      "alpha=0.5 upsamples the lowest-resource stratum")
    assert(largest._5.toDouble / budget <= largest._3 / total + 1e-9,
      "alpha=0.5 downsamples the head stratum")
    // epochs_fp is the per-stratum repeat factor on the 2^20 lattice:
    // upsampling shows as epochs above the corpus-wide budget/total rate
    val globalEpochsFp = budget * (1L << 20) / rows.map(_._3).sum
    assert(smallest._6 >= globalEpochsFp && largest._6 <= globalEpochsFp)
  }

  test("epoch materialization: exact repeat rule, floor/ceil bounds, realized mass meets the allocation") {
    val alloc = TextAnalysis.temperatureMix(docs, "text", col("source"),
      budgetTokens = 100000L)
    val got = TextAnalysis.epochMaterialize(docs, "text", "doc_id",
        col("source"), alloc)
      .as[(Long, String, Long, Long)].collect()
    assert(got.length === docs.count())

    // driver replay of the exact rule from the raw rows
    val raw = docs.select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)).getOrElse("")))
    def tok(t: String) = if (t.trim.isEmpty) 0L else t.trim.split("\\s+").length.toLong
    val sTokens = raw.groupBy(_._2).view.mapValues(_.map(d => tok(d._3)).sum).toMap
    val allocMap = alloc.select("stratum", "alloc_tokens")
      .as[(String, Long)].collect().toMap
    def u16(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(2).map("%02x".format(_)).mkString, 16)
    }
    val expected = raw.map { case (id, s, t) =>
      val st = sTokens(s); val a = allocMap(s)
      val full = a / st
      val thresh = (a % st) * 65536L / st
      (id, s, tok(t), full + (if (u16(t) < thresh) 1L else 0L))
    }.toSet
    assert(got.toSet === expected, "engine repeat counts diverge from the driver replay")

    // deterministic envelope: every doc repeats floor or floor+1 epochs,
    // so realized token mass lies in [floor, floor+1] stratum-epochs —
    // the hash decides WHERE in the envelope it lands (in expectation at
    // the allocation; the exact-replay assertion above pins the rule)
    got.groupBy(_._2).foreach { case (s, rows) =>
      val st = sTokens(s); val a = allocMap(s); val full = a / st
      assert(rows.forall(r => r._4 == full || r._4 == full + 1),
        s"stratum $s has a repeat count outside {floor, floor+1}")
      val realized = rows.map(r => r._3 * r._4).sum
      assert(realized >= st * full && realized <= st * (full + 1),
        s"stratum $s realized $realized outside [${st * full}, ${st * (full + 1)}]")
    }
  }
}
