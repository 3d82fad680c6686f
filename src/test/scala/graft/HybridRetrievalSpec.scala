package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, HybridRetrieval, SimilaritySearch}

class HybridRetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  import SparkTestBase.Sf0001

  test("rrf math: both-leg documents fuse rank contributions, single-leg get one term") {
    val lex = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rn")
    val dense = Seq((2L, 1L), (4L, 2L)).toDF("id", "rn")
    val out = HybridRetrieval.rrf(Seq("lex" -> lex, "dense" -> dense), "id",
        kRrf = 60, topK = 10)
      .select("id", "rrf", "rn").as[(Long, Double, Long)].collect()
      .sortBy(_._3)
    // doc 2: 1/62 + 1/61; doc 1: 1/61; doc 4: 1/62; doc 3: 1/63
    assert(out.map(_._1).toSeq === Seq(2L, 1L, 4L, 3L))
    assert(out(0)._2 === 1.0 / 62 + 1.0 / 61)
    assert(out(1)._2 === 1.0 / 61)
    assert(out(2)._2 === 1.0 / 62)
    assert(out(3)._2 === 1.0 / 63)
  }

  test("rrf ties break by id; topK cuts after fusion") {
    val a = Seq((10L, 1L), (20L, 2L)).toDF("id", "rn")
    val b = Seq((20L, 1L), (10L, 2L)).toDF("id", "rn")
    val out = HybridRetrieval.rrf(Seq("a" -> a, "b" -> b), "id", 60, 1)
      .select("id").as[Long].collect()
    // both fuse to 1/61 + 1/62 — the tie must break to the smaller id,
    // and topK=1 keeps exactly one row
    assert(out.toSeq === Seq(10L))
  }

  test("guards: fewer than two legs and duplicate names are rejected") {
    val one = Seq((1L, 1L)).toDF("id", "rn")
    intercept[IllegalArgumentException] {
      HybridRetrieval.rrf(Seq("only" -> one), "id")
    }
    intercept[IllegalArgumentException] {
      HybridRetrieval.rrf(Seq("x" -> one, "x" -> one), "id")
    }
  }

  test("hybrid query: fused docs carry their own legs' ranks; every doc is in >= 1 leg") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val lex = Bm25.search(docs, "text", "doc_id", Seq("dup", "merge", "scan"), topK = 50)
      .select(col("doc_id"), col("rn"))
    val q0 = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val dense = SimilaritySearch.bruteForceKnn(emb, q0, 50)
      .select(col("vec_id").as("doc_id"), col("rn"))
    val fused = HybridRetrieval.rrf(Seq("lex" -> lex, "dense" -> dense), "doc_id")
      .collect()
    assert(fused.length === 10)
    val lexRanks = lex.as[(Long, Long)].collect().toMap
    val denseRanks = dense.select(col("doc_id"), col("rn").cast("long"))
      .as[(Long, Long)].collect().toMap
    fused.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val rl = Option(r.getAs[java.lang.Long]("rn_lex")).map(_.toLong)
      val rd = Option(r.getAs[java.lang.Long]("rn_dense")).map(_.toLong)
      assert(rl.isDefined || rd.isDefined, s"doc $id in neither leg")
      assert(rl === lexRanks.get(id), s"doc $id lex rank drifted")
      assert(rd === denseRanks.get(id), s"doc $id dense rank drifted")
    }
    // the self-match (vec 0, cosine 1) is dense rank 1 — it must survive
    // fusion unless the lexical leg pushes 10 both-leg docs above it; with
    // 1/61 from a rank-1 leg alone, verify it scored exactly that unless
    // it also appears in the lexical leg
    val d0 = fused.find(_.getAs[Long]("doc_id") === 0L)
    d0.foreach { r =>
      if (r.isNullAt(r.fieldIndex("rn_lex")))
        assert(r.getAs[Double]("rrf") === 1.0 / 61)
    }
  }
}
