package graft

import org.apache.spark.sql.SparkSession

/** Materialize a beyond-bench-scale corpus directory for the HASH-VERIFIED
  * oracle replay (VERDICT r16 #3): the BenchScaling replication recipe
  * (token-tagged documents, letter-tagged part names, key-offset lineitem,
  * sign-flipped embeddings), written as a self-contained
  * `documents/part/lineitem/embeddings.parquet` directory that `Verify` +
  * `tools/oracle_check.py` treat exactly like a driver `sf` dir.
  * BENCH_SCALING.md's CPU curves say the hot plans scale; this corpus lets
  * the DuckDB oracle say the ANSWERS stay right above sf0.1.
  *
  * Tables whose output dir already carries a `_SUCCESS` marker are
  * SKIPPED (per-table resume): an interrupted build — or a re-run after
  * the recipe gained a table, as embeddings did in r19 — continues from
  * where it stopped instead of re-paying finished writes.
  *
  * Usage: sbt "runMain graft.ScaledCorpus <baseSfDir> <outDir> <replicas>"
  * (replicas = 3 for the x3 ≈ sf0.3-equivalent point).
  */
object ScaledCorpus {
  def main(args: Array[String]): Unit = {
    val Array(baseDir, outDir, replicasStr) = args
    val replicas = replicasStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def build(table: String)(write: => Unit): Unit =
      if (new java.io.File(s"$outDir/$table.parquet/_SUCCESS").exists())
        println(s"[scaled-corpus] skip $table (complete write present)")
      else write
    build("documents") {
      BenchScaling.writeScaledDocuments(spark, baseDir, outDir, replicas)
    }
    build("part") {
      BenchScaling.writeScaledPart(spark, baseDir, outDir, replicas)
    }
    build("lineitem") {
      BenchScaling.writeScaledLineitem(spark, baseDir, outDir, replicas)
    }
    build("embeddings") {
      BenchScaling.writeScaledEmbeddings(spark, baseDir, outDir, replicas)
    }
    println(s"[scaled-corpus] wrote documents/part/lineitem/embeddings " +
      s"x$replicas from $baseDir to $outDir")
    spark.stop()
  }
}
