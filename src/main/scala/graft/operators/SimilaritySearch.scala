package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`), SURVEY.md §7.5.
 *
 * Scale shape: the query set is the SMALL side (broadcast); the corpus is the
 * 100 TB side and is never shuffled for the brute-force scan — cosine runs
 * inside the scan's codegen stage and top-k uses a bounded-heap partial
 * aggregate (O(queries x k) rows shuffled, no sort — [[topKPerQuery]]). The LSH/IVF variant prunes
 * the corpus scan to matching buckets via an equi-join on the bucket key.
 */
object SimilaritySearch {

  /** Shared defaults of the IVF/SQ8 index family — the ONE definition the
    * method signatures below default to AND SparkEntry's DuckDB oracle SQL
    * interpolates, so a changed default can never desynchronize query and
    * oracle (r17 advisory: the SQL used to hardcode 16/4/32). */
  val DefaultNlist = 16
  val DefaultNprobe = 4
  val DefaultRerank = 32

  /** [[chooseNprobe]]'s default candidate ladder and recall target —
    * shared with the ss_knn_ivfsq8_auto oracle SQL for the same
    * cannot-drift reason as the index defaults above. */
  val AutoNprobeCandidates: Seq[Int] = Seq(2, DefaultNprobe, 8)
  val AutoTargetRecall = 0.9

  /** Adds an integer `bucket` column: sign bits of `planes` random
    * hyperplane projections (fused single-pass kernel — see
    * [[graft.functions.HyperplaneBucket]]; weights from
    * [[graft.functions.VectorMath.planeWeight]], stable across rounds).
    * `dim` is retained for signature stability; the kernel uses the runtime
    * vector length. */
  def withHyperplaneBucket(df: DataFrame, vecCol: String, planes: Int,
                           dim: Int, seed: Long): DataFrame =
    df.withColumn("bucket", hyperplane_bucket(col(vecCol), lit(planes), lit(seed)))

  /**
   * Per-query top-k selection over a scored candidate frame, shared by the
   * brute / LSH / IVF variants. For a Long id column it runs as the
   * bounded-heap [[graft.functions.TopKAgg]] aggregate — a
   * TypedImperativeAggregate participates in PARTIAL aggregation, so each
   * map task reduces its candidate slice to a k-element heap BEFORE the
   * exchange and the shuffle carries O(queries x k) rows per partition
   * instead of one row per scored pair, with no sort at all (measured ~15%
   * CPU off ss_knn_classify at sf0.1 — 1.07 vs 1.28 converged min-CPU; the
   * win grows with candidate-set size). Heap eviction order (ord DESC, id
   * ASC) is exactly the window form's `ORDER BY cosine DESC, id ASC` —
   * q20_topk_agg hash-matches the window oracle, proving the equivalence.
   * Non-Long id columns fall back to the rank-limit window
   * (WindowGroupLimit bounds pre-shuffle state there too, but still sorts
   * and still moves every scored pair). Callers must pre-deduplicate
   * (queryId, corpusId) candidates — the heap has no id-dedup.
   *
   * NULL-score contract: NULL cosines are dropped up front on BOTH paths
   * (the heap aggregate would silently skip them while the window would
   * rank them last — the filter makes the two paths agree). A candidate
   * with a NULL score is a non-result, never a rank-k filler; a query
   * whose every candidate scores NULL is absent from the output.
   */
  private def topKPerQuery(scored0: DataFrame, k: Int,
                           queryId: String, corpusId: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val scored = scored0.filter(col("cosine").isNotNull)
    if (scored.schema(corpusId).dataType == LongType) {
      scored.groupBy(col(queryId))
        .agg(topk_by(col("cosine"), col(corpusId), k).as("topk"))
        .select(col(queryId), posexplode(col("topk")).as(Seq("pos", "p")))
        .select(col(queryId), col("p.id").as(corpusId), col("p.ord").as("cosine"),
          (col("pos") + 1).cast("int").as("rn"))
    } else {
      val w = Window.partitionBy(col(queryId))
        .orderBy(col("cosine").desc, col(corpusId).asc)
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col(queryId), col(corpusId), col("cosine"), col("rn"))
    }
  }

  /**
   * Brute-force exact top-k cosine neighbors for every query vector.
   * `queries` (small, broadcast) x `corpus` -> BroadcastNestedLoopJoin,
   * cosine in codegen, bounded-heap top-k per query ([[topKPerQuery]]).
   */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                    corpusId: String = "vec_id", corpusVec: String = "embedding",
                    queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("cosine", cosine_sim(col(corpusVec), col(queryVec)))
    topKPerQuery(scored, k, queryId, corpusId)
  }

  /**
   * kNN label propagation (auto-labeling): each query's label is the
   * majority label among its k nearest corpus neighbors — the weak-labeling
   * pass that bootstraps classifiers from a small labeled corpus. Vote ties
   * break to the smallest label, so predictions are deterministic. Returns
   * (queryId, pred_label, n_votes).
   *
   * Scale shape: inherits [[bruteForceKnn]]'s broadcast-queries/
   * never-shuffle-the-corpus plan; voting shuffles only narrow
   * (query, label) rows, k per query. Swap in [[lshKnn]]/[[ivfKnn]]
   * upstream for approximate candidates at larger query sets.
   */
  def knnClassify(corpus: DataFrame, queries: DataFrame, k: Int,
                  labelCol: String = "label",
                  corpusId: String = "vec_id", corpusVec: String = "embedding",
                  queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val nn = bruteForceKnn(corpus, queries, k, corpusId, corpusVec, queryId, queryVec)
    val votes = nn.join(corpus.select(col(corpusId), col(labelCol)), corpusId)
      .groupBy(col(queryId), col(labelCol).as("pred_label"))
      .agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("n_votes").desc, col("pred_label").asc)
    votes.withColumn("vr", row_number().over(w))
      .filter(col("vr") === 1).drop("vr")
  }

  /**
   * LSH-bucketed ANN over `numTables` independent hash tables (table `l`
   * uses plane weights seeded by `seed + l`). Both sides are bucketed per
   * table and joined on the `(table, bucket)` equi-key, so only same-bucket
   * candidates are scored — the join is never a bit_count nested loop.
   *
   * `multiProbe` (default on) additionally probes every Hamming-1 neighbor
   * bucket of each query within each table — one flipped sign bit — by
   * EXPLODING the query side into `planes + 1` probe rows per table. A
   * (query, corpus) pair can match in several tables, so candidates are
   * deduplicated on `(queryId, corpusId)` before the top-k selection
   * (without this a near duplicate could occupy two of the k slots).
   *
   * Scale shape: queries stay broadcast; the corpus is never shuffled for
   * candidate generation — it is exploded x`numTables` INSIDE the scan
   * stage (scan cost x L, no exchange). The only shuffles move the pruned
   * candidate set, keyed by query: dedup + bounded-heap top-k
   * ([[topKPerQuery]]). Corpus prune factor per
   * table is ~(planes+1)/2^planes; recall compounds across tables as
   * 1-(1-p)^L. Defaults (3 tables x 4 planes, Hamming<=1) give a
   * DETERMINISTIC 0.92 recall@5 on the driver's random-vector embeddings
   * fixture — the adversarial case for LSH (true neighbors at cosine
   * ~0.3-0.44); clustered real-world embeddings sit far above this.
   * OperatorsSpec pins recall@5 >= 0.9 vs [[bruteForceKnn]].
   */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             planes: Int = 4, dim: Int = 64, seed: Long = 42L,
             numTables: Int = 3, multiProbe: Boolean = true,
             corpusId: String = "vec_id", corpusVec: String = "embedding",
             queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    def withTableBuckets(df: DataFrame, vecCol: String): DataFrame =
      df.select(col("*"), explode(array((0 until numTables).map(l =>
        struct(lit(l).as("tbl"),
          hyperplane_bucket(col(vecCol), lit(planes), lit(seed + l)).as("bucket"))): _*)).as("tb"))
        .select(col("*"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
        .drop("tb")
    val c = withTableBuckets(corpus, corpusVec)
    val q0 = withTableBuckets(queries, queryVec)
    val q = if (!multiProbe) q0 else
      q0.withColumn("bucket", explode(array(
        col("bucket") +: (0 until planes).map(p => col("bucket").bitwiseXOR(lit(1 << p))): _*)))
    // score INSIDE the bucket-join stage, then project to narrow rows
    // BEFORE the pair-dedup exchange: duplicate (query, corpus) hits from
    // different tables/probes carry identical cosines, so deduping the
    // (queryId, corpusId, cosine) projection is equivalent — and the
    // dedup shuffle moves 24-byte rows instead of two raw vectors per
    // candidate (the same cold-vector contract as the PQ family)
    val scored = c.join(broadcast(q), Seq("tbl", "bucket"))
      .withColumn("cosine", cosine_sim(col(corpusVec), col(queryVec)))
      .select(col(queryId), col(corpusId), col("cosine"))
      .dropDuplicates(queryId, corpusId)
    topKPerQuery(scored, k, queryId, corpusId)
  }

  /** Deterministic IVF coarse-quantizer centroids: the first `n` corpus
    * vectors by id. A production deployment trains k-means here; taking a
    * fixed corpus prefix keeps the quantizer fully deterministic (and
    * therefore DuckDB-oracle-able) while exercising the identical
    * assign/probe plumbing. Centroids are collected to the driver — n is
    * dimension-table sized (16-4096), never data-sized. */
  def ivfCentroids(corpus: DataFrame, n: Int,
                   corpusId: String = "vec_id",
                   corpusVec: String = "embedding"): Array[(Long, Array[Float])] =
    corpus.orderBy(col(corpusId)).limit(n)
      .select(col(corpusId), col(corpusVec)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** Trained IVF coarse-quantizer: SPHERICAL k-means centroids fit with
    * MLlib (seed-pinned, so the index build is reproducible run-to-run).
    * Vectors are L2-NORMALIZED before the fit: the serve path assigns
    * cells by COSINE argmax ([[cellExpr]]), and Euclidean k-means on the
    * unit sphere is the cosine-aligned training objective (Dhillon &
    * Modha 2001) — fitting raw magnitudes instead trains cells the
    * cosine assignment then disagrees with. The driver corpora are
    * already unit-norm (measured 1.0 ± 1e-7), so the normalization is a
    * NO-OP there; its evidence lives on a corpus with genuine magnitude
    * spread — SsRecallTrainedSpec's magnitude-skewed clustered fixture
    * (4 of 16 clusters scaled ×40), measured r20 at nlist=16, nprobe=1,
    * seed 32, maxIter 20, exact-cosine serve: SPHERICAL fit recall@5
    * 1.000 vs RAW-magnitude fit 0.880. On the isotropic sf0.1 driver
    * corpus the committed pin reads trained 0.61 vs prefix 0.67 at
    * nprobe=4/nlist=16 (ssRecallTrainedPins) — inside the spec's pinned
    * noise band: a structureless sphere has nothing for training to
    * exploit, which is why the strict trained≥prefix assertion lives on
    * the clustered fixture (1.000 vs 0.960 at nprobe=1), not there. Same
    * signature and (cid, vector) shape as [[ivfCentroids]] — pass the
    * result to [[ivfKnn]]'s `centroids` parameter. Training is the one-off
    * index build: at 100 TB it runs on a sample — pass `sampleFraction`
    * (seed-pinned Bernoulli sample, so the build stays reproducible) to
    * bound each k-means iteration to a fraction of the corpus instead of
    * maxIter full scans; k-means quality saturates well below full-corpus
    * scans. Only the k centroid vectors ever reach the driver. Centroids
    * are NOT corpus rows, so unlike the prefix quantizer the result is not
    * DuckDB-reproducible — which is why the deterministic prefix stays the
    * oracle-facing default. */
  def kmeansCentroids(corpus: DataFrame, n: Int,
                      corpusVec: String = "embedding",
                      seed: Long = 32L, maxIter: Int = 20,
                      sampleFraction: Option[Double] = None): Array[(Long, Array[Float])] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(sampleFraction.forall(f => f > 0.0 && f <= 1.0),
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val base = sampleFraction.fold(corpus)(f =>
      corpus.sample(withReplacement = false, f, seed))
    val features = base
      .filter(col(corpusVec).isNotNull)
      .withColumn("__norm", sqrt(aggregate(col(corpusVec),
        lit(0.0), (acc, v) => acc + v * v)))
      .filter(col("__norm") > 0.0)
      .select(array_to_vector(transform(col(corpusVec).cast("array<double>"),
        v => v / col("__norm"))).as("features"))
    val model = new KMeans().setK(n).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").fit(features)
    model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i.toLong, c.toArray.map(_.toFloat))
    }
  }

  /** Nearest-centroid cell id (cosine argmax, centroid-id-asc tiebreak) as
    * a single fused-kernel expression: per-row scan of the centroid
    * reference array — NO shuffle and no per-row window. The earlier
    * struct-sort Column form (`sort_array(array(struct(-cos, cid)...))`)
    * sorted an nlist-element struct array per corpus row — fine at
    * nlist=16, the PQ-HOF pathology at production nlist=1024-4096; the
    * [[graft.functions.NearestCentroids]] kernel is a bounded insertion,
    * equivalence pinned by KernelPropsSpec + OperatorsSpec. Measured on
    * the sf0.1 corpus (noop sink, warm, min-of-5): kernel flat at
    * 0.057/0.056/0.081 s for nlist=16/64/256 while the struct-sort form
    * scales 0.114/0.161/0.491 s — 2.0x/2.9x/6.1x, diverging linearly in
    * nlist exactly as predicted. */
  private def cellExpr(vec: Column, centroids: Array[(Long, Array[Float])]): Column =
    element_at(nearest_centroids(vec, centroids, 1), 1)

  /** The query-side probe list: each query's `nprobe` nearest cells, one
    * row per probe — same kernel, same ordering contract. */
  private def probeExpr(vec: Column, centroids: Array[(Long, Array[Float])],
                        nprobe: Int): Column =
    explode(nearest_centroids(vec, centroids, nprobe))

  /** Index-build observability: incremented once per [[pqCodebooks]] call
    * (the driver-side collect that anchors a PQ index build). A serving
    * loop that accidentally rebuilds its index per micro-batch shows up as
    * this counter advancing with the batch count — AnnServingSpec pins it
    * at exactly one per serving run. */
  val codebookBuilds = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Deterministic product-quantization codebooks: subspace `j`'s `ksub`
    * centroids are the j-th subvector slices of the first `ksub` non-null,
    * nonzero-norm corpus vectors by id, L2-NORMALIZED BEFORE SLICING (so
    * PQ approximates cosine — see [[pqKnn]]). The same fixed-prefix trade
    * as [[ivfCentroids]]: a production build trains per-subspace k-means
    * ([[pqCodebooksTrained]], Jegou et al. 2011); the prefix keeps the
    * whole index DuckDB-oracle-able while exercising identical encode/ADC
    * plumbing. Result indexed [subspace][code] — m x ksub x (dim/m)
    * floats, driver-sized. Null / zero-norm vectors are filtered in the
    * FRAME, before the limit, so the prefix is exactly the oracle's
    * "first ksub valid vectors of the corpus" whatever the invalid-row
    * density (the old first-2*ksub-then-filter form could silently shrink
    * below ksub). */
  def pqCodebooks(corpus: DataFrame, m: Int, ksub: Int,
                  corpusId: String = "vec_id",
                  corpusVec: String = "embedding"): Array[Array[Array[Double]]] = {
    codebookBuilds.incrementAndGet()
    val normSq = expr(
      s"aggregate($corpusVec, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    val protos = corpus.filter(col(corpusVec).isNotNull).filter(normSq > 0.0)
      .orderBy(col(corpusId)).limit(ksub)
      .select(col(corpusVec)).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n)
      }
    require(protos.length == ksub,
      s"PQ codebooks need $ksub valid prototype vectors, corpus has ${protos.length}")
    require(protos.head.length % m == 0,
      s"PQ needs dim divisible by m, got dim=${protos.head.length} m=$m " +
        "(a remainder would silently drop the vector tail from ADC scoring)")
    val sub = protos.head.length / m
    Array.tabulate(m)(j => protos.map(_.slice(j * sub, (j + 1) * sub)))
  }

  /** TRAINED product-quantization codebooks: per-subspace k-means (Jegou,
    * Douze, Schmid 2011 — the construction FAISS ships) over the
    * L2-normalized corpus subvectors, the production counterpart of
    * [[pqCodebooks]]'s deterministic prefix — the same pairing as
    * [[kmeansCentroids]] vs [[ivfCentroids]] on the IVF side. Seed-pinned
    * (subspace j trains with seed + j), so the index build is reproducible
    * run-to-run; like the trained IVF quantizer it is NOT corpus-row-
    * derived and hence not DuckDB-replayable, which is why the prefix
    * stays the oracle-gated default. Training is the one-off index build:
    * at 100 TB it runs on a sample — pass `sampleFraction` (seed-pinned,
    * applied once before the persist, so all m subspace fits train on the
    * SAME sampled rows) to bound the m x maxIter k-means passes to a
    * fraction of the corpus; k-means quality saturates far below
    * full-corpus scans. Only m x ksub x (dim/m) doubles reach the driver.
    * PqSpec pins reproducibility, that trained codebooks do not lose
    * recall@5 to the prefix ones, and that a sampled build keeps that same
    * recall floor on the embeddings fixture. */
  def pqCodebooksTrained(corpus: DataFrame, m: Int, ksub: Int,
                         corpusVec: String = "embedding",
                         seed: Long = 32L, maxIter: Int = 20,
                         sampleFraction: Option[Double] = None): Array[Array[Array[Double]]] = {
    codebookBuilds.incrementAndGet()
    require(sampleFraction.forall(f => f > 0.0 && f <= 1.0),
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val base = sampleFraction.fold(corpus)(f =>
      corpus.sample(withReplacement = false, f, seed))
    val normSq = expr(
      s"aggregate($corpusVec, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    // norm as a COLUMN, referenced from inside the lambda: embedding the
    // whole-vector aggregate in the per-element body would re-run it for
    // every element (Catalyst does not hoist subtrees out of HOF lambdas
    // — the documented PQ-kernel pathology), turning an O(dim) normalize
    // into O(dim^2) per row
    val nv = base.filter(col(corpusVec).isNotNull).filter(normSq > 0.0)
      .select(col(corpusVec).as("__v"), sqrt(normSq).as("__n"))
      .selectExpr("transform(__v, x -> CAST(x AS DOUBLE) / __n) AS nv")
    fitSubspaceBooks(nv, "nv", m, ksub, seed, maxIter)
  }

  /** Shared per-subspace k-means scaffold of [[pqCodebooksTrained]] and
    * [[pqResidualCodebooksTrained]]: persist the projected vector frame,
    * fit `ksub` codewords on each of the m dim/m slices with seed + j
    * pinning, unpersist — the two builders differ ONLY in the vectors
    * they project (normalized raw vs residual), so the seed/sample/fit
    * semantics the PqSpec pins rely on cannot drift between them. */
  private def fitSubspaceBooks(vecs: DataFrame, vecCol: String, m: Int,
                               ksub: Int, seed: Long,
                               maxIter: Int): Array[Array[Array[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val v = vecs.persist()
    try {
      val dim = v.select(size(col(vecCol))).head().getInt(0)
      require(dim % m == 0,
        s"PQ needs dim divisible by m, got dim=$dim m=$m")
      val sub = dim / m
      Array.tabulate(m) { j =>
        val features = v.select(
          array_to_vector(slice(col(vecCol), j * sub + 1, sub)).as("features"))
        val model = new KMeans().setK(ksub).setSeed(seed + j).setMaxIter(maxIter)
          .setFeaturesCol("features").fit(features)
        model.clusterCenters.map(_.toArray)
      }
    } finally v.unpersist()
  }

  // PQ encode / ADC-table / ADC-sum kernels live in
  // graft.functions.{PqEncode, PqAdcTables, PqAdc}: the equivalent
  // Column-tree forms (m x ksub aggregate/zip_with terms, each duplicating
  // the normalization subtree — lambda HOFs are excluded from
  // subexpression elimination) measured ~36 ms PER ROW; the fused kernels
  // are O(dim x ksub) with two allocations (same pathology and fix as
  // HyperplaneBucket).

  /**
   * Product-quantization ANN with asymmetric-distance scoring and exact
   * re-rank — the memory-bandwidth scale path for embedding search: the
   * corpus is compressed to `m` one-byte codes per vector (64 floats ->
   * 8 codes here, a 32x scan-size cut at 100 TB), candidates are scored
   * with `m` table lookups instead of a `dim`-wide dot product, and only
   * the top `rerank` survivors per query are re-scored exactly.
   *
   * Both sides are L2-normalized first, so the ADC sum approximates COSINE
   * (dot of unit vectors) and the final re-rank/top-k contract matches the
   * brute/LSH/IVF variants (exact cosine, id-asc tiebreak).
   *
   * Scale shape: encoding is a one-off scan-local expression (the index
   * build — at 100 TB the codes are what gets persisted, the raw vectors
   * stay cold until re-rank); each query precomputes its m x ksub ADC
   * lookup tables ONCE on the broadcast side; the per-pair cost is m
   * array lookups + adds inside the join's codegen stage. The only
   * shuffles carry the rerank-bounded candidate set keyed by query.
   */
  /** ADC-prune (top `rerank` per query) + exact-cosine re-rank + top-k —
    * the tail shared by [[pqKnn]] and [[ivfPqKnn]]. Input: candidate rows
    * carrying __codes and __tables; `corpus`/`queries` supply the RAW
    * vectors for the exact re-rank.
    *
    * COLD-VECTOR SHAPE (r12): the ADC stage is projected down to
    * (queryId, corpusId, __adc) BEFORE the rank window, so the ADC
    * exchange carries ~24-byte rows — not the raw vectors (the previous
    * form shipped the embedding column through the shuffle with every
    * candidate, and its cosine reference blocked the scan from ever
    * pruning a persisted codes table down to the codes column). The
    * rerank-bounded survivor set (|queries| x rerank rows — broadcast-
    * sized by construction) then joins the vectors back: this is what
    * makes "the codes are what gets persisted, the raw vectors stay cold
    * until re-rank" true in the executed plan, not just the docs. */
  private def adcRerank(candidates0: DataFrame, corpus: DataFrame,
                        queries: DataFrame, rerank: Int, k: Int,
                        queryId: String, corpusId: String,
                        corpusVec: String, queryVec: String,
                        adc: Column = pq_adc(col("__tables"), col("__codes"))): DataFrame = {
    val wAdc = Window.partitionBy(col(queryId))
      .orderBy(col("__adc").desc, col(corpusId).asc)
    val pruned = candidates0
      .withColumn("__adc", adc)
      .filter(col("__adc").isNotNull)
      .select(col(queryId), col(corpusId), col("__adc"))
      .withColumn("__arn", row_number().over(wAdc))
      .filter(col("__arn") <= rerank)
      .select(col(queryId), col(corpusId))
    val scored = corpus.select(col(corpusId), col(corpusVec))
      .join(broadcast(pruned), corpusId)
      .join(broadcast(queries.select(col(queryId), col(queryVec))), queryId)
      .withColumn("cosine", cosine_sim(col(corpusVec), col(queryVec)))
      .select(col(queryId), col(corpusId), col("cosine"))
    topKPerQuery(scored, k, queryId, corpusId)
  }

  /** The corpus side of the PQ index: `corpus` plus its `__codes` column
    * (m bytes per vector). This IS the one-off index build — at 100 TB the
    * result is what gets persisted (or cached, for a serving run), so the
    * encode pass runs once, not once per query batch. */
  def pqEncodeCorpus(corpus: DataFrame, books: Array[Array[Array[Double]]],
                     corpusVec: String = "embedding"): DataFrame =
    corpus.withColumn("__codes", pq_encode(col(corpusVec), books))

  /** PQ search against a PRE-ENCODED corpus (see [[pqEncodeCorpus]]): each
    * query batch pays only its own ADC-table projection, the ADC join and
    * the exact re-rank — no codebook collect, no corpus re-encode. This is
    * the entry point a serving loop calls per micro-batch
    * ([[graft.streaming.AnnServing]]); [[pqKnn]] composes it with a fresh
    * index build for the one-shot batch case. */
  def pqKnnEncoded(codedCorpus: DataFrame, books: Array[Array[Array[Double]]],
                   queries: DataFrame, k: Int, rerank: Int = DefaultRerank,
                   corpusId: String = "vec_id", corpusVec: String = "embedding",
                   queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val q = queries.select(col(queryId),
      pq_adc_tables(col(queryVec), books).as("__tables"))
    adcRerank(
      codedCorpus.select(col(corpusId), col("__codes")).crossJoin(broadcast(q)),
      codedCorpus, queries, rerank, k, queryId, corpusId, corpusVec, queryVec)
  }

  /**
   * Per-dimension symmetric-absmax scales of the SQ8 quantizer:
   * `scale_d = max_corpus |x_d| / 127`. A bounded collect — one double
   * per DIMENSION, independent of corpus size (the same driver-state
   * class as the PQ codebooks). Computed over non-NULL vectors; a
   * constant-zero dimension scales to 0 and encodes to 0.
   */
  /** Index-build observability for the SQ8 family — the [[codebookBuilds]]
    * contract: incremented once per [[sq8Scales]] collect, so a serving
    * loop that accidentally re-derives its scales per micro-batch shows up
    * as this counter advancing with the batch count (AnnServingSpec pins
    * one per run). */
  val scaleBuilds = new java.util.concurrent.atomic.AtomicLong(0L)

  def sq8Scales(corpus: DataFrame, vecCol: String = "embedding"): Array[Double] = {
    scaleBuilds.incrementAndGet()
    corpus.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy("d").agg(max(abs(col("x").cast("double"))).as("mx"))
      .orderBy("d").collect().map(_.getDouble(1) / 127.0)
  }

  /** The SQ8 dequantized-vector expression: per dimension,
    * `clamp(round(x_d / scale_d), ±127) * scale_d` — the value the stored
    * int8 code reconstructs to. One codegen `transform`; all arithmetic
    * deterministic IEEE (round is half-away-from-zero in both engines),
    * so DuckDB replays every element. */
  private def sq8Dequant(vec: Column, scales: Array[Double]): Column = {
    val sl = array(scales.map(lit): _*)
    transform(vec, (x, i) => {
      val s = element_at(sl, i + 1)
      when(s === 0.0, lit(0.0)).otherwise(
        greatest(lit(-127.0), least(lit(127.0), round(x.cast("double") / s))) * s)
    })
  }

  /**
   * Scalar-quantized (SQ8 / int8) ANN — the OTHER production quantizer
   * next to PQ: one int8 code per DIMENSION (4x memory cut on float32,
   * no codebook training, near-lossless recall) where PQ spends one byte
   * per SUBSPACE (32x cut, trained books). A production vector store
   * typically serves SQ8 as the hot tier and IVF-PQ as the cold tier.
   *
   * Search = approximate pass on the dequantized vectors (cosine of the
   * reconstructions — numerator and norms both from the quantized
   * values, so quantization error is honestly in the ranking), exact
   * cosine re-rank of the top `rerank` survivors via the shared
   * [[adcRerank]] scaffold. Zero-norm / NULL vectors are excluded on
   * both sides (the PQ exclusion contract).
   *
   * Scale shape: the scales collect is dim-bounded; the scan carries the
   * dequantized arrays (in production the stored artifact is the int8
   * codes — 1/4 the bytes; reconstruction is a scan-side multiply);
   * queries broadcast; the only shuffles move pruned candidates, exactly
   * the [[pqKnn]] plan.
   */
  def sq8Knn(corpus: DataFrame, queries: DataFrame, k: Int,
             rerank: Int = DefaultRerank,
             corpusId: String = "vec_id", corpusVec: String = "embedding",
             queryId: String = "query_id", queryVec: String = "query_vec",
             scales0: Option[Array[Double]] = None): DataFrame = {
    val scales = scales0.getOrElse(sq8Scales(corpus, corpusVec))
    def enc(df: DataFrame, id: String, vec: String, deqName: String,
            normName: String): DataFrame =
      df.filter(col(vec).isNotNull)
        .select(col(id), sq8Dequant(col(vec), scales).as(deqName))
        .withColumn(normName,
          sqrt(aggregate(col(deqName), lit(0.0), (acc, v) => acc + v * v)))
        .filter(col(normName) > 0.0)
    val c = enc(corpus, corpusId, corpusVec, "__deq", "__dn")
    val q = enc(queries, queryId, queryVec, "__qdeq", "__qn")
    val approx =
      aggregate(zip_with(col("__deq"), col("__qdeq"), (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v) / (col("__dn") * col("__qn"))
    adcRerank(c.crossJoin(broadcast(q)), corpus, queries, rerank, k,
      queryId, corpusId, corpusVec, queryVec, adc = approx)
  }

  /**
   * IVF-pruned SQ8 ANN — FAISS's `IVF,SQ8` index family, the composition
   * that removes [[sq8Knn]]'s one remaining full-corpus flat scan: the
   * coarse quantizer assigns every corpus vector to its nearest-centroid
   * cell (scan-local, the one-off index build), each query probes its
   * `nprobe` nearest cells, and the SQ8 approximate pass (cosine of the
   * int8 reconstructions) scores ONLY the surviving cells' rows. Exact
   * cosine re-rank of the top `rerank` survivors via the shared
   * [[adcRerank]] scaffold — the same top-k contract as every variant.
   *
   * Scale shape: the scales collect is dim-bounded and the centroid list
   * driver-sized; cell assignment runs inside the corpus scan's codegen
   * stage (no shuffle, no window); the cell equi-join against the
   * broadcast probe side prunes the corpus to ~nprobe/nCentroids of its
   * rows — no crossJoin anywhere in the plan (PqSpec pins it); the only
   * shuffles move the rerank-bounded candidate set keyed by query. In
   * production the persisted artifact is (cell, int8 codes) partitioned
   * by cell — 1/4 the bytes of the raw vectors AND ~nprobe/nCentroids of
   * the read per query.
   *
   * A corpus row lives in ONE cell and a query probes DISTINCT cells, so
   * the equi-join yields each (query, corpus) pair at most once — no
   * dedup needed before the ADC window (the [[ivfPqKnn]] argument).
   */
  def ivfSq8Knn(corpus: DataFrame, queries: DataFrame, k: Int,
                nCentroids: Int = DefaultNlist, nprobe: Int = DefaultNprobe, rerank: Int = DefaultRerank,
                corpusId: String = "vec_id", corpusVec: String = "embedding",
                queryId: String = "query_id", queryVec: String = "query_vec",
                centroids: Option[Array[(Long, Array[Float])]] = None,
                scales0: Option[Array[Double]] = None): DataFrame = {
    val cents = centroids.getOrElse(ivfCentroids(corpus, nCentroids, corpusId, corpusVec))
    val scales = scales0.getOrElse(sq8Scales(corpus, corpusVec))
    def enc(df: DataFrame, id: String, vec: String, extra: Seq[Column],
            deqName: String, normName: String): DataFrame =
      df.filter(col(vec).isNotNull)
        .select(col(id) +: extra :+ sq8Dequant(col(vec), scales).as(deqName): _*)
        .withColumn(normName,
          sqrt(aggregate(col(deqName), lit(0.0), (acc, v) => acc + v * v)))
        .filter(col(normName) > 0.0)
    // cell assignment by RAW vector (FAISS adds raw vectors to the coarse
    // quantizer; quantization error belongs in the score, not the cell)
    val c = enc(corpus, corpusId, corpusVec,
      Seq(cellExpr(col(corpusVec), cents).as("cell")), "__deq", "__dn")
    val q = enc(queries, queryId, queryVec,
      Seq(probeExpr(col(queryVec), cents, nprobe).as("cell")), "__qdeq", "__qn")
    val approx =
      aggregate(zip_with(col("__deq"), col("__qdeq"), (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v) / (col("__dn") * col("__qn"))
    adcRerank(c.join(broadcast(q), Seq("cell")), corpus, queries, rerank, k,
      queryId, corpusId, corpusVec, queryVec, adc = approx)
  }

  /**
   * Recall-targeted nprobe selection — the `nm_match_topk_auto` pattern
   * applied to ANN serving: a DOCUMENTED, MEASURED statistic picks the
   * configuration, not a guess. For each candidate nprobe (ascending),
   * the IVF,SQ8 index's top-k on a HELD-OUT tuning-query slice is graded
   * against the exact brute-force top-k (the ss_recall_eval measurement
   * reduced to one ratio: |approx ∩ exact| / |exact|), and the FIRST
   * candidate whose recall reaches `targetRecall` wins — the narrowest
   * probe width that is measurably good enough. When none reaches the
   * target the LAST candidate is the documented fallback (the grade then
   * says nlist/rerank need work, not nprobe). Returns (chosen nprobe,
   * recall per candidate — the audit trail).
   *
   * Scale shape: the tuning slice bounds everything — the exact leg is
   * one [[bruteForceKnn]] of |tuning| broadcast queries, each candidate
   * leg probes nprobe/nlist of the corpus, and the pair sets collected
   * to the driver are ≤ k·|tuning| rows each. The decision is a pure
   * function of the corpus (prefix centroids + absmax scales), so the
   * whole chooser replays in DuckDB (ss_knn_ivfsq8_auto's oracle).
   */
  def chooseNprobe(corpus: DataFrame, tuningQueries: DataFrame, k: Int,
                   candidates: Seq[Int] = AutoNprobeCandidates,
                   targetRecall: Double = AutoTargetRecall,
                   nCentroids: Int = DefaultNlist,
                   rerank: Int = DefaultRerank,
                   corpusId: String = "vec_id", corpusVec: String = "embedding",
                   queryId: String = "query_id", queryVec: String = "query_vec",
                   centroids: Option[Array[(Long, Array[Float])]] = None,
                   scales0: Option[Array[Double]] = None): (Int, Seq[(Int, Double)]) = {
    require(candidates.nonEmpty && candidates == candidates.sorted,
      s"nprobe candidates must be ascending and non-empty, got $candidates")
    val cents = centroids.getOrElse(ivfCentroids(corpus, nCentroids, corpusId, corpusVec))
    val scales = scales0.getOrElse(sq8Scales(corpus, corpusVec))
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col(queryId), col(corpusId)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the exact-truth leg and every candidate's approx leg are independent
    // collect() jobs over the same frozen index inputs — run them on
    // concurrent driver threads (guide §2.6, the lshEval pattern) so each
    // leg back-fills the previous leg's straggler tail. Grading math and
    // the collectFirst choice below consume the IN-ORDER results, so the
    // decision (and therefore the served rows) is identical to the
    // sequential form — r20, ss_knn_ivfsq8_auto wall ~3.5 -> ~1.9 s.
    val legs = graft.util.Par.run[Set[(Long, Long)]](
      (() => pairs(bruteForceKnn(corpus, tuningQueries, k,
        corpusId, corpusVec, queryId, queryVec))) +:
      candidates.map(np => () =>
        pairs(ivfSq8Knn(corpus, tuningQueries, k, nCentroids, np,
          rerank, corpusId, corpusVec, queryId, queryVec,
          centroids = Some(cents), scales0 = Some(scales)))))
    val exact = legs.head
    val graded = candidates.zip(legs.tail).map { case (np, approx) =>
      // the ss_recall_eval ratio: hit pairs over exact pairs (a query with
      // zero exact rows contributes nothing to either count)
      np -> (if (exact.isEmpty) 1.0
             else exact.count(approx.contains).toDouble / exact.size)
    }
    val chosen = graded.collectFirst {
      case (np, r) if r >= targetRecall => np
    }.getOrElse(candidates.last)
    (chosen, graded)
  }

  /** IVF,SQ8 search with [[chooseNprobe]]'s recall-targeted probe width:
    * grade on the tuning slice, serve the real queries at the chosen
    * nprobe — one index build (centroids + scales derived once, shared by
    * the grading legs and the serve). The auto pattern's contract: the
    * decision statistic is measured, documented, and replayable
    * (ss_knn_ivfsq8_auto hash-matches a DuckDB replay of grade + choice +
    * serve); AnnAutoSpec pins both decision branches. */
  def ivfSq8KnnAuto(corpus: DataFrame, queries: DataFrame,
                    tuningQueries: DataFrame, k: Int,
                    candidates: Seq[Int] = AutoNprobeCandidates,
                    targetRecall: Double = AutoTargetRecall,
                    nCentroids: Int = DefaultNlist,
                    rerank: Int = DefaultRerank,
                    corpusId: String = "vec_id", corpusVec: String = "embedding",
                    queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val cents = ivfCentroids(corpus, nCentroids, corpusId, corpusVec)
    val scales = sq8Scales(corpus, corpusVec)
    val (np, _) = chooseNprobe(corpus, tuningQueries, k, candidates,
      targetRecall, nCentroids, rerank, corpusId, corpusVec, queryId, queryVec,
      centroids = Some(cents), scales0 = Some(scales))
    ivfSq8Knn(corpus, queries, k, nCentroids, np, rerank,
      corpusId, corpusVec, queryId, queryVec,
      centroids = Some(cents), scales0 = Some(scales))
  }

  /** The SQ8 ENCODE expression: per dimension, the clamped rounded code
    * `clamp(round(x_d / scale_d), ±127)` as a TINYINT — the int8 artifact
    * a production store persists (1/4 the bytes of float32). A zero-scale
    * (constant-zero) dimension encodes to 0. Exact round-trip contract:
    * `code * scale_d` reproduces [[sq8Dequant]]'s double bit-for-bit
    * (round yields an exact integral double; the byte cast and back are
    * exact; the final multiply sees identical operands). */
  private def sq8Encode(vec: Column, scales: Array[Double]): Column = {
    val sl = array(scales.map(lit): _*)
    transform(vec, (x, i) => {
      val s = element_at(sl, i + 1)
      when(s === 0.0, lit(0.0)).otherwise(
        greatest(lit(-127.0), least(lit(127.0), round(x.cast("double") / s))))
        .cast("tinyint")
    })
  }

  /** The corpus side of the PERSISTED SQ8 index: `corpus` plus its
    * `__sq8` int8-codes column — the [[pqEncodeCorpus]] contract for the
    * scalar quantizer. This is the one-off index build: at 100 TB the
    * (id, codes) projection is what gets persisted/cached and served
    * from; raw vectors stay cold until re-rank. */
  def sq8EncodeCorpus(corpus: DataFrame, scales: Array[Double],
                      corpusVec: String = "embedding"): DataFrame =
    corpus.withColumn("__sq8", sq8Encode(col(corpusVec), scales))

  /** SQ8 search against a PRE-ENCODED corpus ([[sq8EncodeCorpus]]) — the
    * serving-loop entry point, mirroring [[pqKnnEncoded]]: the corpus
    * side reconstructs from the int8 CODES (`code * scale`, bit-identical
    * to [[sq8Dequant]] of the raw vector — spec-pinned by frame equality
    * with [[sq8Knn]]), so a query batch touches only the narrow codes
    * projection until the exact re-rank. The [[graft.streaming
    * .AnnServing]] recipe (build once, persist, foreachBatch) applies
    * verbatim with this in place of the PQ pair. */
  /** The corpus side of the PERSISTED IVF,SQ8 index: [[sq8EncodeCorpus]]'s
    * int8 codes PLUS the frozen coarse quantizer's cell id — the
    * (cell, codes) artifact a production store hive-partitions by `cell`,
    * so a probe touches ~nprobe/nCentroids of the FILES and the codes
    * projection reads 1/4 of the BYTES. Cells are assigned from the RAW
    * vector (the [[ivfSq8Knn]] contract: quantization error belongs in
    * the score, not the cell). */
  def ivfSq8EncodeCorpus(corpus: DataFrame, scales: Array[Double],
                         centroids: Array[(Long, Array[Float])],
                         corpusVec: String = "embedding"): DataFrame =
    sq8EncodeCorpus(corpus, scales, corpusVec)
      .withColumn("cell", cellExpr(col(corpusVec), centroids))

  /** IVF,SQ8 search against a PRE-ENCODED, cell-assigned corpus
    * ([[ivfSq8EncodeCorpus]]) — [[sq8KnnCoded]] with the coarse prune in
    * front: the broadcast probe side equi-joins the PERSISTED cell column
    * instead of re-deriving it, so a cell-partitioned store serves the
    * approximate pass from ~nprobe/nCentroids of its partitions (the
    * equi-join against a broadcast probe list is exactly the shape
    * Spark's dynamic partition pruning accelerates on a hive `cell=`
    * layout) — the flat coded variant's one remaining full-codes scan,
    * removed. The `cell` cast tolerates the hive round-trip (partition
    * columns read back as ints). */
  def ivfSq8KnnCoded(codedCorpus: DataFrame, scales: Array[Double],
                     centroids: Array[(Long, Array[Float])],
                     queries: DataFrame, k: Int,
                     nprobe: Int = DefaultNprobe, rerank: Int = DefaultRerank,
                     corpusId: String = "vec_id", corpusVec: String = "embedding",
                     queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val sl = array(scales.map(lit): _*)
    val c = codedCorpus.filter(col("__sq8").isNotNull)
      .select(col(corpusId), col("cell").cast("long").as("cell"),
        transform(col("__sq8"), (cd, i) =>
          cd.cast("double") * element_at(sl, i + 1)).as("__deq"))
      .withColumn("__dn",
        sqrt(aggregate(col("__deq"), lit(0.0), (acc, v) => acc + v * v)))
      .filter(col("__dn") > 0.0)
    val q = queries.filter(col(queryVec).isNotNull)
      .select(col(queryId),
        probeExpr(col(queryVec), centroids, nprobe).as("__cell0"),
        sq8Dequant(col(queryVec), scales).as("__qdeq"))
      // a generator can't nest inside CAST — cast the exploded column
      .withColumn("cell", col("__cell0").cast("long")).drop("__cell0")
      .withColumn("__qn",
        sqrt(aggregate(col("__qdeq"), lit(0.0), (acc, v) => acc + v * v)))
      .filter(col("__qn") > 0.0)
    val approx =
      aggregate(zip_with(col("__deq"), col("__qdeq"), (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v) / (col("__dn") * col("__qn"))
    adcRerank(c.join(broadcast(q), Seq("cell")), codedCorpus, queries, rerank, k,
      queryId, corpusId, corpusVec, queryVec, adc = approx)
  }

  def sq8KnnCoded(codedCorpus: DataFrame, scales: Array[Double],
                  queries: DataFrame, k: Int, rerank: Int = DefaultRerank,
                  corpusId: String = "vec_id", corpusVec: String = "embedding",
                  queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val sl = array(scales.map(lit): _*)
    val c = codedCorpus.filter(col("__sq8").isNotNull)
      .select(col(corpusId),
        transform(col("__sq8"), (cd, i) =>
          cd.cast("double") * element_at(sl, i + 1)).as("__deq"))
      .withColumn("__dn",
        sqrt(aggregate(col("__deq"), lit(0.0), (acc, v) => acc + v * v)))
      .filter(col("__dn") > 0.0)
    val q = queries.filter(col(queryVec).isNotNull)
      .select(col(queryId), sq8Dequant(col(queryVec), scales).as("__qdeq"))
      .withColumn("__qn",
        sqrt(aggregate(col("__qdeq"), lit(0.0), (acc, v) => acc + v * v)))
      .filter(col("__qn") > 0.0)
    val approx =
      aggregate(zip_with(col("__deq"), col("__qdeq"), (a, b) => a * b),
        lit(0.0), (acc, v) => acc + v) / (col("__dn") * col("__qn"))
    adcRerank(c.crossJoin(broadcast(q)), codedCorpus, queries, rerank, k,
      queryId, corpusId, corpusVec, queryVec, adc = approx)
  }

  def pqKnn(corpus: DataFrame, queries: DataFrame, k: Int,
            m: Int = 8, ksub: Int = 16, rerank: Int = DefaultRerank,
            corpusId: String = "vec_id", corpusVec: String = "embedding",
            queryId: String = "query_id", queryVec: String = "query_vec",
            books: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    val b = books.getOrElse(pqCodebooks(corpus, m, ksub, corpusId, corpusVec))
    pqKnnEncoded(pqEncodeCorpus(corpus, b, corpusVec), b, queries, k, rerank,
      corpusId, corpusVec, queryId, queryVec)
  }

  /**
   * IVF-PQ: the production composition (the FAISS `IVFPQ` index family) —
   * the coarse quantizer prunes the corpus to `nprobe` of `nCentroids`
   * cells per query and PQ's ADC tables score only the surviving cells'
   * code rows, so a query touches ~(nprobe/nCentroids) of the corpus AND
   * reads only m bytes per touched vector. Encoding here is by raw vector
   * (FAISS's `by_residual=false`): one deterministic expression per side,
   * and the stronger variant on data without cluster structure.
   * [[ivfPqKnnResidual]] is the `by_residual=true` counterpart — it
   * decomposes q·x ~= q·c + q·r so normalization still holds, and wins
   * when cells are genuinely tighter than the sphere (PqSpec pins both
   * regimes). Exact re-rank of the top `rerank` ADC survivors, as
   * [[pqKnn]].
   */
  def ivfPqKnn(corpus: DataFrame, queries: DataFrame, k: Int,
               nCentroids: Int = DefaultNlist, nprobe: Int = DefaultNprobe,
               m: Int = 8, ksub: Int = 16, rerank: Int = DefaultRerank,
               corpusId: String = "vec_id", corpusVec: String = "embedding",
               queryId: String = "query_id", queryVec: String = "query_vec",
               centroids: Option[Array[(Long, Array[Float])]] = None,
               books0: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    val cents = centroids.getOrElse(ivfCentroids(corpus, nCentroids, corpusId, corpusVec))
    val books = books0.getOrElse(pqCodebooks(corpus, m, ksub, corpusId, corpusVec))
    val c = corpus
      .withColumn("cell", cellExpr(col(corpusVec), cents))
      .withColumn("__codes", pq_encode(col(corpusVec), books))
    val q = queries
      .withColumn("cell", probeExpr(col(queryVec), cents, nprobe))
      .select(col(queryId), col("cell"),
        pq_adc_tables(col(queryVec), books).as("__tables"))
    // a corpus row lives in ONE cell and a query probes DISTINCT cells, so
    // the equi-join yields each (query, corpus) pair at most once — no
    // dedup needed before the ADC window
    adcRerank(
      c.select(col(corpusId), col("cell"), col("__codes"))
        .join(broadcast(q), Seq("cell")),
      corpus, queries, rerank, k, queryId, corpusId, corpusVec, queryVec)
  }

  /** Deterministic RESIDUAL codebooks for [[ivfPqKnnResidual]]: subspace
    * `j`'s codewords are the j-th slices of the residuals (normalized
    * vector − normalized assigned centroid) of `ksub` valid corpus vectors
    * by id, SKIPPING the first `skip` — the quantizer's own prototype rows
    * have ZERO residual (each is its own nearest centroid), so reusing
    * [[pqCodebooks]]' first-ksub prefix would collapse every codeword to
    * ~0 and destroy the quantizer. Defaults skip = nlist. Same
    * deterministic / DuckDB-replayable trade as [[pqCodebooks]]; the
    * centroid lookup runs the exact [[graft.functions.VectorMath
    * .nearestCentroids]] executor kernel on the driver so assignment
    * tiebreaks cannot drift between build and encode. */
  def pqResidualCodebooks(corpus: DataFrame, cents: Array[(Long, Array[Float])],
                          m: Int, ksub: Int, skip: Int = -1,
                          corpusId: String = "vec_id",
                          corpusVec: String = "embedding"): Array[Array[Array[Double]]] = {
    codebookBuilds.incrementAndGet()
    val off = if (skip >= 0) skip else cents.length
    val cids = cents.map(_._1)
    val cvecs = cents.map(_._2)
    val normSq = expr(
      s"aggregate($corpusVec, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    val protos = corpus.filter(col(corpusVec).isNotNull).filter(normSq > 0.0)
      .orderBy(col(corpusId)).offset(off).limit(ksub)
      .select(col(corpusVec)).collect()
      .map(_.getSeq[Float](0).toArray)
    require(protos.length == ksub,
      s"residual PQ codebooks need $ksub prototype vectors after skipping " +
        s"$off, corpus has ${protos.length}")
    val residuals = protos.map { v =>
      val cell = graft.functions.VectorMath
        .nearestCentroids(v, cids, cvecs, 1).getLong(0)
      val ci = cids.indexOf(cell)
      val nv = v.map(_.toDouble)
      val n = math.sqrt(nv.map(x => x * x).sum)
      val cnv = cvecs(ci).map(_.toDouble)
      val cn = math.sqrt(cnv.map(x => x * x).sum)
      Array.tabulate(nv.length)(i => nv(i) / n - cnv(i) / cn)
    }
    require(residuals.head.length % m == 0,
      s"PQ needs dim divisible by m, got dim=${residuals.head.length} m=$m")
    val sub = residuals.head.length / m
    Array.tabulate(m)(j => residuals.map(_.slice(j * sub, (j + 1) * sub)))
  }

  /** TRAINED residual codebooks — the production configuration
    * (`by_residual=true` + per-subspace k-means + sampled fit): subspace
    * `j` trains on the j-th slices of the corpus's residual vectors
    * (normalized vector − normalized assigned centroid, the exact
    * quantity [[graft.functions.PqEncodeRes]] encodes), with the same
    * seed-pinning (seed + j), optional seed-pinned `sampleFraction`
    * bound on the m × maxIter k-means passes, and driver footprint
    * (m × ksub × dim/m doubles) as [[pqCodebooksTrained]]. Like the
    * other trained builders it is not corpus-row-derived, hence not
    * DuckDB-replayable — [[pqResidualCodebooks]]' prefix stays the
    * oracle-gated default; PqSpec pins that the full trained + sampled +
    * residual composition holds the prefix books' recall floor on the
    * clustered fixture. The centroid assignment runs the SAME
    * [[graft.functions.VectorMath.nearestCentroids]] kernel the encode
    * path uses, so build and encode can never disagree on a cell. */
  def pqResidualCodebooksTrained(corpus: DataFrame, cents: Array[(Long, Array[Float])],
                                 m: Int, ksub: Int,
                                 corpusVec: String = "embedding",
                                 seed: Long = 32L, maxIter: Int = 20,
                                 sampleFraction: Option[Double] = None): Array[Array[Array[Double]]] = {
    codebookBuilds.incrementAndGet()
    require(sampleFraction.forall(f => f > 0.0 && f <= 1.0),
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val base = sampleFraction.fold(corpus)(f =>
      corpus.sample(withReplacement = false, f, seed))
    val normSq = expr(
      s"aggregate($corpusVec, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    // normalized centroids ride as a map literal keyed by cell id, so the
    // residual is one zip_with against a looked-up array — norm and cell
    // as COLUMNS outside the lambda (the documented HOF-hoisting pathology)
    val cmap = map(cents.flatMap { case (cid, v) =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      Seq(lit(cid), typedLit(v.map(_.toDouble / n).toSeq))
    }: _*)
    val rv = base.filter(col(corpusVec).isNotNull).filter(normSq > 0.0)
      .select(col(corpusVec).as("__v"), sqrt(normSq).as("__n"),
        cellExpr(col(corpusVec), cents).as("__cell"))
      .withColumn("__c", element_at(cmap, col("__cell")))
      .selectExpr("zip_with(__v, __c, (x, c) -> CAST(x AS DOUBLE) / __n - c) AS rv")
    fitSubspaceBooks(rv, "rv", m, ksub, seed, maxIter)
  }

  /**
   * IVF-PQ with RESIDUAL encoding — FAISS's `by_residual=true`, its
   * default and the variant that preserves recall at production nlist:
   * each corpus vector stores PQ codes of (normalized vector − normalized
   * assigned centroid), so the shared codebooks only span the WITHIN-CELL
   * spread (diameter shrinks as nlist grows) instead of the whole unit
   * sphere. Scoring decomposes q·x ~= q·c + q·r: the per-(query, probe
   * cell) constant comes from the [[graft.functions.CentroidDot]] kernel
   * and the residual term from the same ADC tables/codes machinery as
   * [[ivfPqKnn]] — tables are built against the RESIDUAL codebooks and do
   * not depend on the cell, so a query still computes them once.
   *
   * Scale shape: identical to [[ivfPqKnn]] — cell equi-join against the
   * broadcast probe side, ADC stage projected to (queryId, corpusId,
   * __adc) before its window (no array column in any hash shuffle), exact
   * re-rank of the top `rerank` survivors via broadcast joins.
   */
  def ivfPqKnnResidual(corpus: DataFrame, queries: DataFrame, k: Int,
                       nCentroids: Int = DefaultNlist, nprobe: Int = DefaultNprobe,
                       m: Int = 8, ksub: Int = 16, rerank: Int = DefaultRerank,
                       corpusId: String = "vec_id", corpusVec: String = "embedding",
                       queryId: String = "query_id", queryVec: String = "query_vec",
                       centroids: Option[Array[(Long, Array[Float])]] = None,
                       books0: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    val cents = centroids.getOrElse(ivfCentroids(corpus, nCentroids, corpusId, corpusVec))
    val books = books0.getOrElse(
      pqResidualCodebooks(corpus, cents, m, ksub, corpusId = corpusId, corpusVec = corpusVec))
    val c = corpus
      .withColumn("cell", cellExpr(col(corpusVec), cents))
      .withColumn("__codes", pq_encode_res(col(corpusVec), col("cell"), cents, books))
    val q = queries
      .withColumn("cell", probeExpr(col(queryVec), cents, nprobe))
      .select(col(queryId), col("cell"),
        pq_adc_tables(col(queryVec), books).as("__tables"),
        centroid_dot(col(queryVec), col("cell"), cents).as("__cdot"))
    adcRerank(
      c.select(col(corpusId), col("cell"), col("__codes"))
        .join(broadcast(q), Seq("cell")),
      corpus, queries, rerank, k, queryId, corpusId, corpusVec, queryVec,
      adc = col("__cdot") + pq_adc(col("__tables"), col("__codes")))
  }

  /**
   * IVF-style ANN: corpus vectors are assigned to their nearest-centroid
   * cell ONCE (a scan-local expression — at 100 TB this is the one-off
   * index build, typically persisted partitioned by cell); each query
   * probes its `nprobe` nearest cells and scores only those cells' vectors.
   *
   * Scale shape: centroid assignment costs O(n_centroids) per row inside
   * the scan's codegen stage — no shuffle, no window; the cell equi-join
   * prunes the corpus to ~nprobe/n_centroids of its rows; queries ride
   * broadcast. Recall depends on how well cells capture neighborhoods —
   * pinned empirically by OperatorsSpec on the random-vector fixture (the
   * adversarial case), alongside [[lshKnn]]'s multi-probe numbers.
   */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             nCentroids: Int = DefaultNlist, nprobe: Int = DefaultNprobe,
             corpusId: String = "vec_id", corpusVec: String = "embedding",
             queryId: String = "query_id", queryVec: String = "query_vec",
             centroids: Option[Array[(Long, Array[Float])]] = None): DataFrame = {
    val cents = centroids.getOrElse(ivfCentroids(corpus, nCentroids, corpusId, corpusVec))
    val c = corpus.withColumn("cell", cellExpr(col(corpusVec), cents))
    // nprobe nearest cells per query: same kernel, top-nprobe
    val q = queries
      .withColumn("cell", probeExpr(col(queryVec), cents, nprobe))
    val scored = c.join(broadcast(q), Seq("cell"))
      .withColumn("cosine", cosine_sim(col(corpusVec), col(queryVec)))
    topKPerQuery(scored, k, queryId, corpusId)
  }

  /**
   * MMR-diversified top-k (Maximal Marginal Relevance, Carbonell &
   * Goldstein 1998): greedily select k results maximizing
   * `lambda * rel(d) - (1 - lambda) * max_{s in selected} sim(d, s)` —
   * relevance traded against redundancy, so the result page is not k
   * near-copies of the best hit. THE re-ranking pass of a diversified
   * retrieval / RAG-context stack.
   *
   * Two stages: (1) candidate generation — [[bruteForceKnn]]'s broadcast
   * top-`topN` (swap in the LSH/IVF variants upstream at larger query
   * sets); (2) per-query greedy selection in `flatMapGroups` — genuinely
   * iterative semantics (each pick depends on all previous picks), which
   * no window/join composition expresses; the group is at most `topN`
   * rows, so per-group work is O(topN * k * dim) with bounded memory.
   * The candidate exchange carries `|Q| * topN` embedding rows — bounded
   * by the QUERY set, never corpus-sized, the one place an embedding may
   * legitimately cross a shuffle.
   *
   * Determinism: candidates fold in (rel DESC, vec_id ASC) order, and a
   * score tie picks the smallest vec_id — the exact (score DESC, vec_id
   * ASC) argmax the oracle SQL replays. Pairwise sims use
   * [[VectorMath.cosine]], the same kernel that scored relevance.
   *
   * Output: (queryId, corpusId, mmr_score, rank) — rank is the 1-based
   * selection order; `mmr_score` is the objective value at selection
   * (step 1 has no penalty term: `lambda * rel`).
   */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, k: Int,
                topN: Int, lambda: Double,
                corpusId: String = "vec_id", corpusVec: String = "embedding",
                queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    require(k >= 1 && topN >= k, s"need topN >= k >= 1, got k=$k topN=$topN")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cands = bruteForceKnn(corpus, queries, topN, corpusId, corpusVec,
        queryId, queryVec)
      .join(corpus.select(col(corpusId), col(corpusVec).as("__v")), corpusId)
      .select(col(queryId), col(corpusId), col("cosine"), col("__v"))
      .as[(Long, Long, Double, Array[Float])]
    cands.groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double, Array[Float])]) =>
        val pool = scala.collection.mutable.ArrayBuffer.from(
          it.map(c => (c._2, c._3, c._4)).toSeq.sortBy(c => (-c._2, c._1)))
        val sel = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Long)]
        while (sel.length < k && pool.nonEmpty) {
          var bestIdx = 0
          var bestScore = Double.NegativeInfinity
          var bestId = Long.MaxValue
          var i = 0
          while (i < pool.length) {
            val (id, rel, vec) = pool(i)
            // true max-sim penalty (GREATEST in the oracle — may be
            // negative); step 1 (sel empty) has no penalty term
            var pen = 0.0
            if (sel.nonEmpty) {
              pen = Double.NegativeInfinity
              sel.foreach { s =>
                val sim = VectorMath.cosine(vec, s)
                if (sim > pen) pen = sim
              }
            }
            val score = lambda * rel - (1.0 - lambda) * pen
            if (score > bestScore || (score == bestScore && id < bestId)) {
              bestScore = score; bestIdx = i; bestId = id
            }
            i += 1
          }
          val (id, _, vec) = pool.remove(bestIdx)
          sel += vec
          out += ((qid, id, bestScore, sel.length.toLong))
        }
        out.iterator
      }
      .toDF(queryId, corpusId, "mmr_score", "rank")
  }
}
