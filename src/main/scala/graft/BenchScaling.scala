package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scaling-curve harness for the hot queries (VERDICT r15 #5): measures
 * wall/cpu at sf0.01/0.1/1-EQUIVALENT corpus sizes so the "would this
 * survive a 100x scale-up" question gets empirical slopes instead of an
 * argument. BENCH_SCALING.md records the curves per round.
 *
 * Corpus construction (the fairness-load-bearing part):
 *  - x1 is the real sf0.1 `documents`/`part` tables; x0.1 samples them
 *    10x down by key; x3/x10 REPLICATE them with key offsets.
 *  - Replicated documents get every token suffixed with a replica tag
 *    (`r0`, `r1`, ...): a bijective token map per replica, so each
 *    replica's INTERNAL near-dup structure (shingle sets, jaccards, LSH
 *    buckets) is exactly the original corpus's, while CROSS-replica
 *    similarity is zero. Duplicate DENSITY therefore stays constant as
 *    rows grow — naive replication without the tag would near-dup every
 *    replica of doc i against every other (pair count quadratic in the
 *    replica count), measuring the fixture, not the engine. The x1/x0.1
 *    points get the `r0` tag too, so every scale point pays the identical
 *    text transformation.
 *  - Key offsets are multiples of 97, preserving the `% 97` eval-split /
 *    username-sampling proportions at every scale.
 *  - `part` replicas get per-replica letter-tagged name tokens (see
 *    [[writeScaledPart]]) so username distinctness and name cardinality
 *    grow with the corpus — the production regime for both roster
 *    variants.
 *
 * Output: one JSON line {query: {scale: {rows_in, rows_out, wall, cpu,
 * gc_stw}}} plus a copy at `$outRoot/scaling.json`. `gc_stw` is the
 * stop-the-world GC seconds inside the min-CPU rep's window — the
 * channel that separates operator cost from collector burn when reading
 * a CPU slope. Env knobs: SPARK_GRAFT_SCALING_QUERIES /
 * _SCALES (comma filters), _REPS, SPARK_GRAFT_SHUFFLE (shuffle
 * partitions — scale it with the data the way a real cluster does; the
 * default 32 pins per-task state growth instead).
 */
object BenchScaling {

  /** 97-divisible key offset between replicas (far above any fixture id). */
  private val Offset = 9700000L

  private def tagTokens(text: org.apache.spark.sql.Column, tag: String) =
    array_join(transform(split(text, " "), w => concat(w, lit(tag))), " ")

  /** Scaled documents table: `replicas` token-tagged copies (or a 10x
    * down-sample at replicas = 0), written to `$outDir/documents.parquet`. */
  def writeScaledDocuments(spark: SparkSession, baseDir: String,
                           outDir: String, replicas: Int): Unit = {
    val base = spark.read.parquet(s"$baseDir/documents.parquet")
    val scaled =
      if (replicas == 0)
        base.filter(pmod(col("doc_id"), lit(10)) === 0)
          .withColumn("text", tagTokens(col("text"), "r0"))
      else
        (0 until replicas).map { k =>
          base.select(
            (col("doc_id") + lit(k * Offset)).as("doc_id"),
            tagTokens(col("text"), s"r$k").as("text"),
            col("lang"), col("source"))
        }.reduce(_ unionByName _)
    scaled.withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  /** Scaled part table (the match-workload driver): key-offset replicas
    * with per-replica LETTER-tagged name tokens (stays phonetics-able) —
    * the docs-side bijective-map trick applied to names, so name
    * cardinality and username distinctness grow WITH the corpus (the
    * production regime; an untagged replication keeps p_name's 64
    * distinct names and partkey%1000 constant across replicas, so
    * usernames collapse in the group-by and the workload silently stops
    * scaling — measured r16 before this tag: rows_out plateaued at x10). */
  def writeScaledPart(spark: SparkSession, baseDir: String,
                      outDir: String, replicas: Int): Unit = {
    val base = spark.read.parquet(s"$baseDir/part.parquet")
      .select("p_partkey", "p_name")
    def tagged(df: DataFrame, k: Int) = df.select(
      (col("p_partkey") + lit(k * Offset)).as("p_partkey"),
      array_join(transform(split(col("p_name"), " "),
        w => concat(w, lit(s"z${('a' + k).toChar}"))), " ").as("p_name"))
    val scaled =
      if (replicas == 0)
        tagged(base.filter(pmod(col("p_partkey"), lit(10)) === 0), 0)
      else (0 until replicas).map(k => tagged(base, k)).reduce(_ unionByName _)
    scaled.write.mode("overwrite").parquet(s"$outDir/part.parquet")
  }

  /** Scaled lineitem table (the q16 sketch-workload driver): key-offset
    * replicas of (l_orderkey, l_partkey, l_returnflag, l_extendedprice) —
    * the columns the sketch workload reads. Offsetting l_partkey grows the
    * per-flag distinct-part population with the corpus (the statistic q16's
    * sketches estimate), so the approx-vs-exact error contract is measured
    * against a genuinely larger domain at each scale, not a replicated one.
    * Prices are left untouched: the percentile lattice stays comparable
    * across scales while the row mass under it triples. */
  def writeScaledLineitem(spark: SparkSession, baseDir: String,
                          outDir: String, replicas: Int): Unit = {
    val base = spark.read.parquet(s"$baseDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_returnflag", "l_extendedprice")
    val scaled =
      if (replicas == 0) base.filter(pmod(col("l_orderkey"), lit(10)) === 0)
      else (0 until replicas).map { k =>
        base.select(
          (col("l_orderkey") + lit(k * Offset)).as("l_orderkey"),
          (col("l_partkey") + lit(k * Offset)).as("l_partkey"),
          col("l_returnflag"), col("l_extendedprice"))
      }.reduce(_ unionByName _)
    scaled.write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
  }

  /** Scaled embeddings table (the ANN/index-lifecycle workload driver,
    * r18 verdict #7): key-offset replicas pushed through a PER-REPLICA
    * deterministic sign flip — replica k negates dimension i iff bit
    * (i % 5) of k is set (k = 0 is the identity). Negating a fixed
    * dimension subset is an orthogonal transform, so every replica's
    * INTERNAL cosine/neighbor structure is bit-exactly the base corpus's
    * (IEEE-754 negation is exact) while cross-replica cosines scramble —
    * the docs-side bijective-token-tag trick applied to vector space.
    * Near-neighbor density therefore stays constant as rows grow; naive
    * replication would make each query's top-k a tie-class of its own
    * copies, grading the id tiebreak instead of the index. Per-dimension
    * absmax is flip-invariant, so the SQ8 scales the lifecycle queries
    * freeze at seed time match the base corpus's at every scale, and the
    * 97-divisible key offset preserves every %10/%20/%100 slice the
    * ss_* queries cut. The oracle needs none of this recipe: it derives
    * scales/centroids/codes from the written table, exactly like Spark. */
  def writeScaledEmbeddings(spark: SparkSession, baseDir: String,
                            outDir: String, replicas: Int): Unit = {
    val base = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val dim = base.select(size(col("embedding"))).head().getInt(0)
    // Per-dimension sign = bit i of splitmix64(k) (ADVICE r19): the first
    // cut took bit (i % 5) of the raw replica index, so replicas whose
    // indices differ in one low bit flipped only ~13/64 dims and a vector
    // sat at cosine ~0.59 against its own copy — far above the isotropic
    // background (sigma ~ 1/sqrt(64) ~ 0.125), i.e. every query's
    // neighborhood was still dominated by its flipped twins. With mixed
    // bits each dim flips independently (p = 1/2) between any two
    // replicas, so a copy-pair cosine is sum(s_i * v_i^2): mean 0, spread
    // set by the corpus's coordinate kurtosis (sum v_i^4), not by 1/dim.
    // MEASURED r20 on the sf0.1 embeddings: copy-pair mean |cos| 0.25
    // (sd ~0.3; 200 sampled pairs) vs the 0.10 independent-pair
    // background — no longer deterministic-dominant, though a kurtosis
    // tail pair can still brush the top-5 band. Sign flips are the ONLY
    // absmax/SQ8-scale-preserving diagonal orthogonal transforms, so this
    // residual is the floor for this construction; non-copy cross-replica
    // pairs sit at the exact independent background (signs cancel).
    // k = 0 keeps the identity transform so the x1/x0.1 points stay the
    // raw base table. Dims beyond 64 reuse bits (i % 64) — fine at the
    // fixture's dim = 64. absmax/SQ8-scale invariance is preserved: signs
    // are +/-1 per dimension.
    def splitmix64(seed: Long): Long = {
      var z = seed + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def flipped(k: Int): DataFrame = {
      val mix = if (k == 0) 0L else splitmix64(k.toLong)
      val signs = (0 until dim).map(i =>
        if (((mix >>> (i % 64)) & 1L) == 1L) -1.0f else 1.0f)
      base.select(
        (col("vec_id") + lit(k * Offset)).as("vec_id"),
        zip_with(col("embedding"), array(signs.map(lit): _*),
          (v, s) => v * s).as("embedding"),
        col("label"))
    }
    val scaled =
      if (replicas == 0)
        flipped(0).filter(pmod(col("vec_id"), lit(10)) === 0)
      else (0 until replicas).map(flipped).reduce(_ unionByName _)
    scaled.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  private def processCpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  /** Cumulative stop-the-world GC milliseconds across all collectors —
    * the diagnosis channel for CPU-vs-rows superlinearity (GC burn is
    * process CPU but not operator cost). */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  private def time(fn: (SparkSession, String) => DataFrame,
                   spark: SparkSession, dir: String,
                   reps: Int, label: String): (Double, Double, Double, Long) = {
    System.gc()
    // rows_out rides the FIRST timed rep as an Observation (a row-count
    // metric collected by the noop write itself) instead of an extra
    // untimed full execution, which ~1.5x-ed harness cost per point. The
    // observe is attached to rep 1 only so the min-over-reps window stays
    // comparable rep-to-rep (the aggregate's cost is a rounding error, but
    // a metric name may appear only once per plan — and this keeps even
    // that once out of the later reps).
    val obs = org.apache.spark.sql.Observation(s"bs_rows_$label")
    val runs = (1 to reps).map { i =>
      val g0 = gcMillis()
      val c0 = processCpuNs()
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val sink = if (i == 1) df.observe(obs, count(lit(1)).as("n")) else df
      sink.write.format("noop").mode("overwrite").save()
      ((System.nanoTime() - t0) / 1e9, (processCpuNs() - c0) / 1e9,
        (gcMillis() - g0) / 1e3)
    }
    val rows = obs.get("n").asInstanceOf[Long]
    // report the gc window of the min-CPU rep (the number being trusted)
    val best = runs.minBy(_._2)
    (runs.map(_._1).min, best._2, best._3, rows)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outRoot = args.drop(1).headOption.getOrElse("/tmp/graft_scale")
    val onlyQs = sys.env.get("SPARK_GRAFT_SCALING_QUERIES")
      .map(_.split(",").toSet)
    val onlyScales = sys.env.get("SPARK_GRAFT_SCALING_SCALES")
      .map(_.split(",").toSet)
    val repsEnv = sys.env.get("SPARK_GRAFT_SCALING_REPS").map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      // sort-based shuffle writer for all shuffles — see the measured
      // rationale in Bench.scala (small-R bypass writer file churn)
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (tag, replicas, sf-equivalent label)
    val allScales = Seq(("x0.1", 0, "sf0.01"), ("x1", 1, "sf0.1"),
      ("x3", 3, "sf0.3"), ("x10", 10, "sf1"))
    val scales = allScales.filter(s => onlyScales.forall(_.contains(s._1)))
    scales.foreach { case (tag, reps, _) =>
      val dir = s"$outRoot/$tag"
      writeScaledDocuments(spark, baseDir, dir, reps)
      writeScaledPart(spark, baseDir, dir, reps)
    }
    val docRows = scales.map { case (tag, _, _) =>
      tag -> spark.read.parquet(s"$outRoot/$tag/documents.parquet").count()
    }.toMap
    val partRows = scales.map { case (tag, _, _) =>
      tag -> spark.read.parquet(s"$outRoot/$tag/part.parquet").count()
    }.toMap

    val docQs = Seq("dd_lsh_eval", "dd_ngram_jaccard", "dd_containment",
      "tx_curate_e2e")
    val nmQs = Seq("nm_match_topk_blocked", "nm_match_topk_blocked_wide")
    val all = (docQs ++ nmQs).filter(q => onlyQs.forall(_.contains(q)))

    // JIT/codegen warmup on the smallest corpus
    all.foreach { q =>
      try SparkEntry.queries(q)(spark, s"$outRoot/x0.1")
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[scaling] warmup $q: $e") }
    }

    val out = new StringBuilder("{")
    var firstQ = true
    all.foreach { q =>
      if (!firstQ) out.append(","); firstQ = false
      out.append("\"" + q + "\":{")
      var firstS = true
      scales.foreach { case (tag, _, sfLabel) =>
        val reps = repsEnv.getOrElse(2)
        val (wall, cpu, gc, rows) = time(SparkEntry.queries(q), spark,
          s"$outRoot/$tag", reps, s"${q}_$tag")
        val rowsIn = if (docQs.contains(q)) docRows(tag) else partRows(tag)
        if (!firstS) out.append(","); firstS = false
        out.append(f"""\"$tag\":{"sf":"$sfLabel","rows_in":$rowsIn,"rows_out":$rows,"wall":$wall%.3f,"cpu":$cpu%.3f,"gc_stw":$gc%.3f}""")
        System.err.println(f"[scaling] $q $tag rows_in=$rowsIn rows_out=$rows wall=$wall%.2f cpu=$cpu%.2f gc_stw=$gc%.2f")
      }
      out.append("}")
    }
    out.append("}")
    println(out.toString)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outRoot/scaling.json"),
      out.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
