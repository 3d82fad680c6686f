package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE training semantics on hand-computed corpora (the tx_bpe_* queries'
  * operator layer): greedy most-frequent-pair merges, total-order
  * tie-break, left-to-right non-overlapping merge application. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("greedy merges on the classic corpus, deterministic tie order") {
    // word counts: low*5, lower*2, newest*6, widest*3 (the Sennrich demo
    // corpus shape). Pair (e,s) appears in newest(6) + widest(3) = 9 —
    // the unique max. After (e,s)->es, (es,t) appears 9 times, again max.
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest")
    ).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, numMerges = 2)
    assert(merges === Seq((1, "e", "s"), (2, "es", "t")))
  }

  test("tie-break is (count DESC, left ASC, right ASC)") {
    // "ab" and "cd" both appear twice; (a,b) < (c,d) lexicographically
    val docs = Seq((1L, "ab cd"), (2L, "ab cd")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, numMerges = 2)
    assert(merges === Seq((1, "a", "b"), (2, "c", "d")))
  }

  test("tie-break compares CODE POINTS, not UTF-16 code units") {
    // U+E000 (a BMP private-use char, one UTF-16 unit 0xE000) vs U+10000
    // (supplementary, surrogate pair starting 0xD800): String.compareTo
    // orders the SURROGATE first (0xD800 < 0xE000) but code-point /
    // UTF-8-byte order — what UTF8String and the SQL oracle sort by —
    // orders U+E000 (57344) < U+10000 (65536). Both pairs tie at count 1
    // with equal left symbol, so the right-symbol comparison decides.
    val supp = new String(Character.toChars(0x10000))
    val pua = "\uE000"
    val docs = Seq((1L, s"a$pua a$supp")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, numMerges = 1)
    assert(merges === Seq((1, "a", pua)),
      "count tie must resolve in code-point order (U+E000 before U+10000)")
  }

  test("overlapping pair merges left-to-right non-overlapping") {
    // "aaa": pair (a,a) counts once per adjacent position but merges only
    // the leftmost disjoint occurrences -> ["aa", "a"]; next round the
    // winning pair is (aa, a)
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, numMerges = 2)
    assert(merges === Seq((1, "a", "a"), (2, "aa", "a")))
  }

  test("early stop when no pair remains; single-char words train nothing") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    assert(Bpe.trainMerges(docs, numMerges = 4) === Seq.empty)
  }

  test("apply: token counts shrink by one per merge occurrence, words never fuse") {
    val docs = Seq((1L, "low lower"), (2L, "west")).toDF("doc_id", "text")
    // no merges: one token per character
    val none = Bpe.applyTokenCount(docs, Seq.empty).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(none === Map(1L -> 8L, 2L -> 4L))
    // merge (l,o) then (lo,w): "low"->1 token, "lower"->3 (low,e,r);
    // crucially (w,e) inside "west" must not fuse across the "low|er"
    // word boundary in doc 1
    val merged = Bpe.applyTokenCount(docs,
        Seq((1, "l", "o"), (2, "lo", "w"), (3, "w", "e"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc1: low=1, lower=low+e+r=3 (the (w,e) merge cannot reach across
    // the word separator); doc2: west -> we,s,t = 3
    assert(merged === Map(1L -> 4L, 2L -> 3L))
  }

  test("applyTokens: token strings in order, counts agree with applyTokenCount") {
    val docs = Seq((1L, "low lower"), (2L, "west"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val merges = Seq((1, "l", "o"), (2, "lo", "w"))
    val toks = Bpe.applyTokens(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[String](1).toList, r.getLong(2)))).toMap
    // doc1: "low"->[low], "lower"->[low,e,r]; doc2 untouched chars;
    // doc3 (null text): empty sequence, never NULL. The column is an
    // ARRAY: document text may itself contain any scalar join separator
    assert(toks(1L) === ((List("low", "low", "e", "r"), 4L)))
    assert(toks(2L) === ((List("w", "e", "s", "t"), 4L)))
    assert(toks(3L) === ((Nil, 0L)))
    // count parity with the count-only path on a non-null corpus
    val corpus = Seq((1L, "low lower"), (2L, "west")).toDF("doc_id", "text")
    val a = Bpe.applyTokens(corpus, merges).select("doc_id", "n_tokens_bpe")
      .as[(Long, Long)].collect().toMap
    val b = Bpe.applyTokenCount(corpus, merges)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("merge list matches a from-scratch symbol-list trainer (driver-fold pin)") {
    // Independent oracle: textbook BPE over SYMBOL LISTS (no marker-string
    // encoding shared with the implementation under test) — greedy
    // most-frequent adjacent pair, (count DESC, l ASC, r ASC) tie order,
    // left-to-right non-overlapping rewrite. Pins the r11 driver-side fold
    // against the algorithm, not against its own representation.
    def naive(words: Seq[(String, Long)], numMerges: Int): Seq[(Int, String, String)] = {
      var dict = words.map { case (w, c) => (w.map(_.toString).toList, c) }
      val out = Seq.newBuilder[(Int, String, String)]
      var rank = 1
      var done = false
      while (rank <= numMerges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        dict.foreach { case (syms, c) =>
          syms.zip(syms.drop(1)).foreach { p => counts(p) = counts.getOrElse(p, 0L) + c }
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), _) = counts.minBy { case ((l, r), c) => (-c, l, r) }
          out += ((rank, l, r))
          def rewrite(syms: List[String]): List[String] = syms match {
            case a :: b :: rest if a == l && b == r => (l + r) :: rewrite(rest)
            case a :: rest => a :: rewrite(rest)
            case Nil => Nil
          }
          dict = dict.map { case (syms, c) => (rewrite(syms), c) }
          rank += 1
        }
      }
      out.result()
    }
    // deterministic pseudo-corpus with repeated stems, shared suffixes,
    // single-char words and an overlap-prone run
    val vocab = Seq("lowest", "lower", "low", "newest", "newer", "wide",
      "widest", "a", "aaaa", "abab", "banana", "bandana", "stream", "steam")
    val words = (0 until 400).map(i => vocab(i * 7 % vocab.size))
    val docs = words.grouped(10).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val expect = naive(
      words.groupBy(identity).toSeq.map { case (w, g) => (w, g.size.toLong) },
      numMerges = 12)
    assert(Bpe.trainMerges(docs, numMerges = 12) === expect)
  }

  test("train frame carries rank order and merged spellings") {
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val frame = Bpe.train(docs, numMerges = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(frame.length === 2)
    assert(frame.map(_._1).toSeq === Seq(1L, 2L))
    assert(frame.forall { case (_, l, r, m) => m === l + r })
  }
}
