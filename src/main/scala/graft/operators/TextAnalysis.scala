package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/**
 * Text-analysis operators for the training-data pipeline surface
 * (language-ID, quality scoring, token counting, fingerprinting). All are
 * narrow per-row projections — no shuffle, fully codegen'd, scan-pruned to
 * the text column — so they stream at parquet-scan speed at any scale.
 */
object TextAnalysis {

  /** Whitespace token count (deterministic, SQL-oracle-able). NULL text
    * counts NULL, not -1: Spark's `size(null)` is -1, which would silently
    * diverge from any SQL oracle's NULL on a corpus with missing texts.
    * The null guard is the arithmetic `+ length(text) * 0` term (NULL in,
    * NULL out; 0 otherwise) rather than a `when(isNull)` wrapper: putting
    * the whole pipeline inside a conditional branch blocks codegen
    * subexpression reuse — measured ~40% slower on tx_profile. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+"))) +
      length(text) * lit(0)

  /** BPE-ish subword count: splits on word boundaries AND digit/letter
    * transitions, approximating byte-pair tokenizer granularity without a
    * vocab. NULL-safe like [[tokenCount]] (same arithmetic guard). */
  def subwordCount(text: Column): Column = {
    val pieces = split(trim(text),
      "\\s+|(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])|(?=[^A-Za-z0-9\\s])|(?<=[^A-Za-z0-9\\s])")
    size(filter(pieces, p => length(p) > 0)) + length(text) * lit(0)
  }

  /** Text canonicalization for dedup/fingerprinting: Unicode-normalize
    * (default NFKC — compatibility fold: ligatures, width variants,
    * composed/decomposed accents), optionally lowercase, collapse
    * whitespace runs to single spaces, trim. Running this BEFORE
    * minhash/simhash/exact-hash makes visually-identical text hash
    * identically — without it a corpus crawled from mixed sources keeps
    * `ﬁnal`/`final` and `café`/`cafe´` as distinct documents. Appends
    * `text_norm` and `changed` (false for NULL text). Pure codegen
    * projection — shuffle-free at any scale. */
  def normalizeText(df: DataFrame, textCol: String, form: String = "NFKC",
                    lowercase: Boolean = true): DataFrame = {
    val normed = unicode_normalize(col(textCol), lit(form))
    val lowered = if (lowercase) lower(normed) else normed
    df.withColumn("text_norm", trim(regexp_replace(lowered, "\\s+", " ")))
      .withColumn("changed",
        col(textCol).isNotNull && col(textCol) =!= col("text_norm"))
  }

  /** Line-level quality features — the heuristics corpus-curation
    * pipelines run on crawled text where DOCUMENT-level stats look fine
    * but the line structure betrays boilerplate: fraction of non-empty
    * lines ending in terminal punctuation (prose ends sentences; nav/menu
    * debris doesn't), fraction starting like bullets or numbered lists,
    * and the duplicate-line fraction (repeated headers/footers). All
    * computed with split + higher-order array functions inside the scan's
    * codegen stage — shuffle-free at any scale. NULL text yields NULL
    * features (the [[tokenCount]] arithmetic-guard convention). */
  def withLineQualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // NULL-propagation guard: NULL text -> NULL out; 0 otherwise
    val guard = length(t) * lit(0)
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => length(l) > 0)
    val n = size(lines) // -1 for NULL text (Spark's size(null) convention)
    def ratio(cnt: Column): Column =
      when(n > 0, cnt.cast("double") / n).otherwise(lit(0.0)) + guard
    df.withColumn("n_lines",
        (when(n < 0, 0).otherwise(n) + guard).cast("long"))
      .withColumn("term_punct_line_ratio",
        ratio(size(filter(lines, l => l.rlike("[.!?]$")))))
      .withColumn("bullet_line_ratio",
        ratio(size(filter(lines, l => l.rlike("^([-*]|[0-9]+[.)])")))))
      .withColumn("dup_line_ratio",
        ratio(n - size(array_distinct(lines))))
  }

  /**
   * Character-diversity quality metrics — the repetitiveness signal
   * corpus-curation pipelines use to drop keyboard-mash / padded / binary-
   * leak documents whose token-level stats can still look plausible.
   *
   * Diversity is the Simpson index `1 - Σ cᵢ² / n²` over the per-document
   * character histogram (0 = one repeated char, →1 = uniform spread),
   * chosen over Shannon entropy DELIBERATELY: it is a RATIONAL function
   * of exact integer counts — one correctly-rounded divide and one
   * subtract — so every engine computes the identical double, where
   * entropy's `log` is not correctly rounded and hash-parity would be
   * platform luck. Also emits the top-character share `max cᵢ / n` (the
   * dominant-symbol screen) and the distinct-char count.
   *
   * The histogram is built WITHOUT exploding characters into the engine:
   * `array_sort` the char array, then one `aggregate` fold over the
   * sorted runs — O(len·log len) per row, shuffle-free, bounded state
   * (a 4-field struct), versus the explode form whose shuffle carries
   * one row PER CHARACTER (at 100 TB of text that is the whole corpus
   * re-keyed by (doc, char) — the difference between a projection and a
   * second copy of the data in flight).
   *
   * Empty/NULL texts are dropped (no chars → no histogram).
   * Output: (idCol, n_chars BIGINT, distinct_chars BIGINT,
   * simpson_index DOUBLE, top_char_ratio DOUBLE).
   */
  def charDiversity(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val chars = split(col(textCol), "")
    val sorted = array_sort(chars)
    // fold over sorted runs: (prev char, current run, Σ run², max run).
    // The "" sentinel never collides with a real element (split-on-empty
    // yields single chars only), so the first char always opens a run.
    val z = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("sq"), lit(0L).as("mx"))
    val folded = aggregate(sorted, z,
      (acc, c) => {
        val prev = acc.getField("prev"); val run = acc.getField("run")
        val sq = acc.getField("sq"); val mx = acc.getField("mx")
        when(c === prev,
          struct(prev.as("prev"), (run + 1L).as("run"), sq.as("sq"), mx.as("mx")))
          .otherwise(struct(c.as("prev"), lit(1L).as("run"),
            (sq + run * run).as("sq"), greatest(mx, run).as("mx")))
      },
      acc => struct(
        (acc.getField("sq") + acc.getField("run") * acc.getField("run")).as("sq"),
        greatest(acc.getField("mx"), acc.getField("run")).as("mx")))
    df.filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .withColumn("__f", folded)
      .withColumn("__n", size(chars).cast("long"))
      .select(col(idCol),
        col("__n").as("n_chars"),
        size(array_distinct(chars)).cast("long").as("distinct_chars"),
        (lit(1.0) - col("__f.sq").cast("double") /
          (col("__n") * col("__n")).cast("double")).as("simpson_index"),
        (col("__f.mx").cast("double") / col("__n").cast("double"))
          .as("top_char_ratio"))
  }

  /** Quality features: length, token stats, punctuation + stopword ratios.
    * Returns df with appended columns. */
  def withQualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokenCount(t)
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_tokens", toks)
      .withColumn("avg_token_len",
        when(toks > 0, (length(regexp_replace(t, "\\s+", "")).cast("double") / toks))
          .otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(length(t) > 0,
          length(regexp_replace(t, "[^\\p{Punct}]", "")).cast("double") / length(t))
          .otherwise(lit(0.0)))
      .withColumn("stopword_ratio_q", stopword_ratio(t))
      .withColumn("quality_score", qualityScore(t))
  }

  /** The composite quality score as ONE scan-side Column over the raw
    * text — the same formula [[withQualityFeatures]] appends (single
    * definition, no drift), usable standalone where only the score is
    * needed (e.g. [[Dedup.corpusDedupQuality]]'s representative choice). */
  def qualityScore(t: Column): Column = {
    val toks = tokenCount(t)
    val avgLen =
      when(toks > 0, length(regexp_replace(t, "\\s+", "")).cast("double") / toks)
        .otherwise(lit(0.0))
    val punct =
      when(length(t) > 0,
        length(regexp_replace(t, "[^\\p{Punct}]", "")).cast("double") / length(t))
        .otherwise(lit(0.0))
    when(toks >= 5 && avgLen.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0)) *
      (lit(1.0) - least(punct * 4, lit(1.0)))
  }

  private def stopword_ratio(t: Column): Column = {
    // the shared kernel list, sorted for a deterministic literal array —
    // a second hand-maintained copy here could drift from the kernels
    val stop = array(
      graft.functions.TextAlgos.EnglishStopwords.toSeq.sorted.map(lit): _*)
    val toks = filter(split(lower(trim(t)), "\\s+"), p => length(p) > 0)
    when(size(toks) > 0,
      size(filter(toks, tk => array_contains(stop, tk))).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /**
   * Boilerplate / contamination detector: word `n`-grams occurring in at
   * least `minDocs` DISTINCT documents (the C4/RefinedWeb-style frequent-
   * span pass — such spans are navigation chrome, license headers, or
   * eval-set contamination, and get masked or dropped upstream of
   * training).
   *
   * Scale shape: one explode to NARROW (gram, doc_id) rows — payloads
   * never enter the shuffle — then countDistinct with map-side partial
   * aggregation. Gram strings could be hashed to 64-bit for an even
   * narrower shuffle at 100 TB; kept as strings here so the output is
   * directly actionable (and SQL-oracle-able).
   */
  /** All word `n`-grams of a text column as `array<string>` (empty when
    * the document has fewer than `n` tokens) — THE gram constructor:
    * every consumer (the exact and Bloom decontamination passes, the
    * boilerplate census, the streaming gate) derives from this one
    * column expression, so tokenizer/window/separator semantics can
    * never drift between passes. */
  /** Word n-gram strings via the fused [[graft.functions.NgramArray]]
    * kernel. The original HOF form (`transform(sequence, i ->
    * array_join(slice(toks, i, n)))`) computes the same grams but pays
    * per-element Catalyst dispatch outside subexpression elimination —
    * measured ~3x the scan CPU on the contamination/boilerplate family;
    * KernelPropsSpec pins kernel == HOF on randomized inputs. */
  private[graft] def gramArray(text: Column, n: Int): Column =
    graft.functions.ngram_array(text, lit(n))

  /** The HOF Column form of [[gramArray]] — kept as the property-test
    * reference the kernel is pinned against. */
  private[graft] def gramArrayHof(text: Column, n: Int): Column = {
    val toks = filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Narrow (id, gram) rows: [[gramArray]] exploded — the shared shape
    * under [[frequentNgrams]] and [[contamination]]. */
  private def ngramRows(df: DataFrame, textCol: String, idCol: String,
                        outId: String, n: Int): DataFrame =
    df.select(col(idCol).as(outId),
      explode(gramArray(col(textCol), n)).as("gram"))

  /**
   * Corpus-relative rarity profile: for each document, the fraction of its
   * DISTINCT words that are hapax legomena — words with corpus document
   * frequency <= `rareDf` (default 1: they appear in no other document). A
   * model-free statistical quality signal: natural-language documents share
   * most of their vocabulary with the corpus, while random strings, ids,
   * base64 blobs and OCR noise are hapax-dominated — the corpus-relative
   * complement of the row-local heuristics in [[withQualityFeatures]] (a
   * document full of plausible-looking but globally-unique tokens passes
   * those untouched).
   *
   * Words are the 64-bit hashes of [[graft.functions.ShingleSet]] at w = 1
   * (distinct per doc, so the census counts DOCUMENTS), which keeps every
   * shuffle narrow — (hash, count) pairs, never strings — and makes the
   * DuckDB oracle bit-exact through the already-mirrored FNV kernel.
   *
   * Scale shape: one explode to narrow (doc_id, word-hash) rows; the
   * vocabulary census is a map-side-combined count on the hash; the
   * scoring join is narrow-on-narrow (payloads never shuffle) and the
   * per-document re-aggregation groups on the dense id. Empty/whitespace
   * documents surface with n_words_distinct = 0 and NULL rare_frac.
   */
  def rareWordStats(df: DataFrame, textCol: String, idCol: String,
                    rareDf: Long = 1L): DataFrame = {
    val words = df.select(col(idCol).as("id"),
      explode(shingle_set(col(textCol), lit(1))).as("wh"))
    val census = words.groupBy("wh").agg(count(lit(1)).as("df"))
    val scored = words.join(census, "wh")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words_distinct"),
           sum(when(col("df") <= rareDf, 1L).otherwise(0L)).as("n_rare"))
    df.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_words_distinct"), lit(0L)).as("n_words_distinct"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        (col("n_rare").cast("double") / col("n_words_distinct")).as("rare_frac"))
  }

  /**
   * Corpus-trained bigram language-model fluency score — the CCNet-style
   * statistical quality filter: train add-one-smoothed bigram counts over
   * the corpus itself, then score each document by its MEAN conditional
   * token probability P(w_i | w_{i-1}) = (c2(w_{i-1} w_i) + 1) /
   * (c1(w_{i-1}) + V). Fluent prose rides high-count transitions; shuffled
   * words, keyword stuffing and gibberish score low even when every
   * individual token is common — the transition-level complement of
   * [[rareWordStats]]'s vocabulary-level signal.
   *
   * DETERMINISM: each per-position probability is computed in EXACT integer
   * arithmetic as `(c2 + 1) * 1e9 div (c1 + V)` nano-probability units, so
   * the per-document sum is an order-independent long sum and the only
   * floating-point op is one final division — hash-reproducible on any
   * partitioning and bit-identical in the DuckDB oracle (no libm, no
   * float-accumulation order). The long multiply bounds the corpus at
   * c2 < 9.2e9 occurrences of one bigram at this scale factor; a trillion-
   * token corpus would drop the scale to 1e6 or widen to DECIMAL.
   *
   * Scale shape: token/bigram hashing is row-local ([[graft.functions.WordShingles]],
   * codegen); both count tables aggregate map-side on 64-bit hashes; the
   * scoring joins are narrow-on-narrow (hash, count) equi-joins; V is a
   * one-row broadcast. At 100 TB the count tables prune low-count tails
   * (`minCount`) the way production LM filters do — counts below the floor
   * carry no signal and dominate table size (Zipf).
   *
   * Output per document: `n_bigrams` (0 for docs under 2 tokens),
   * `nano_mean` (exact mean nano-probability, NULL when no bigrams),
   * `min_nano` (worst single transition — a localized-garbage detector),
   * `mean_prob` (`nano_mean / 1e9` as double).
   */
  def bigramLmScore(df: DataFrame, textCol: String, idCol: String,
                    minCount: Long = 0L): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      word_shingles(col(textCol), lit(1)).as("u"),
      word_shingles(col(textCol), lit(2)).as("b"))
    // unigram occurrence census over ALL docs (duplicates counted)
    val uni = base.select(explode(col("u")).as("wh"))
    val c1 = uni.groupBy("wh").agg(count(lit(1)).as("c1"))
      .filter(col("c1") > minCount)
    val vocab = uni.agg(countDistinct(col("wh")).as("v"))
    // bigram positions only exist in docs with >= 2 tokens: below w the
    // shingle kernel hashes the whole doc as one under-length gram
    val pairs = base.filter(size(col("u")) >= 2)
      .select(col("id"), explode(expr(
        "transform(b, (bh, i) -> struct(u[i] AS ph, bh AS bh))")).as("z"))
      .select(col("id"), col("z.ph").as("ph"), col("z.bh").as("bh"))
    val c2 = pairs.groupBy("bh").agg(count(lit(1)).as("c2"))
      .filter(col("c2") > minCount)
    val scored = pairs
      .join(c2, "bh")
      .join(c1.withColumnRenamed("wh", "ph"), "ph")
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        expr("((c2 + 1) * CAST(1000000000 AS BIGINT)) div (c1 + v)").as("nano"))
    val agg = scored.groupBy("id").agg(
      count(lit(1)).as("n_bigrams"),
      sum(col("nano")).as("sum_nano"),
      min(col("nano")).as("min_nano"))
    df.select(col(idCol).as("id")).join(agg, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        expr("sum_nano div n_bigrams").as("nano_mean"),
        col("min_nano"),
        (expr("sum_nano div n_bigrams").cast("double") / lit(1e9)).as("mean_prob"))
  }

  def frequentNgrams(df: DataFrame, textCol: String, idCol: String,
                     n: Int = 3, minDocs: Int = 5): DataFrame =
    ngramRows(df, textCol, idCol, "doc_id", n)
      .groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /**
   * Eval-set contamination check: training documents sharing any word
   * `n`-gram with an eval/benchmark document are flagged (the n-gram
   * overlap decontamination pass run before training). Returns the
   * contaminated training docs with the count of distinct shared grams.
   *
   * Scale shape: both sides explode to NARROW (gram, id) rows; the join is
   * a gram-keyed equi-join with the (small) eval side broadcast-able, and
   * payloads never shuffle.
   */
  def contamination(train: DataFrame, eval_ : DataFrame, textCol: String,
                    idCol: String, n: Int = 3): DataFrame =
    ngramRows(train, textCol, idCol, "doc_id", n).distinct()
      .join(broadcast(
        ngramRows(eval_, textCol, idCol, "eval_id", n).select("gram").distinct()), "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared_grams"))

  /**
   * [[contamination]] for the regime where the eval/benchmark gram set is
   * too large to broadcast EXACTLY (a full benchmark-suite
   * decontamination pass is easily 10^9 distinct n-grams — tens of GB of
   * strings, but ~1 GB of Bloom bits at 8 bits/element): build a
   * mergeable Bloom sketch of the eval grams ([[graft.functions.BloomAgg]]
   * — one scan, partials OR in the reduce), prefilter the training grams
   * AT THE SCAN with the sketch as a codegen reference object, and run
   * the exact confirmation join only over the bloom-positive survivors.
   *
   * Sound and exact end-to-end: a Bloom filter has NO false negatives, so
   * the prefilter only discards grams that are definitely not shared; the
   * confirmation equi-join removes the false positives. The result is
   * row-identical to [[contamination]] (same oracle), but the gram-keyed
   * exchange carries only survivors — at the default 2^20 bits / 5 probes
   * the non-shared traffic drops by the sketch's false-positive rate
   * (sub-1% when sized at ~10 bits/element) instead of shuffling or
   * broadcasting the full training gram set.
   *
   * The sketch collect is the bounded-driver-state class (numBits/8
   * bytes, independent of data size), NOT a data-sized collect.
   */
  def contaminationBloom(train: DataFrame, eval_ : DataFrame, textCol: String,
                         idCol: String, n: Int = 3, numBits: Int = 1 << 20,
                         numHashes: Int = 5): DataFrame = {
    val evalGrams = ngramRows(eval_, textCol, idCol, "eval_id", n)
      .select("gram").distinct()
    val sketch = evalGramSketch(eval_, textCol, idCol, n, numBits, numHashes)
    // scan-side prefilter, then the exact confirm join: shuffle-keyed (not
    // broadcast) deliberately — this operator exists for eval sets past
    // the broadcast threshold, and its exchange carries survivors only
    ngramRows(train, textCol, idCol, "doc_id", n).distinct()
      .where(bloom_might_contain(xxhash64(col("gram")), sketch))
      .join(evalGrams.hint("shuffle_hash"), "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
  }

  /**
   * Cross-suite contamination MATRIX — [[contamination]] against K
   * benchmark suites in ONE training-corpus pass: a production
   * decontamination run checks every eval suite it serves (MMLU, GSM8K,
   * HumanEval, ...) and must not re-scan a 100 TB corpus per suite. The
   * training grams explode ONCE; the build side is the union of each
   * suite's distinct gram set tagged with its suite name (suites are tiny
   * next to the corpus — the union broadcasts), and the exact
   * distinct-shared-gram count comes out per (document, suite).
   *
   * Output: (idCol, suite, n_shared_grams) — sparse long form, one row
   * per contaminated (document, suite) pair; a document leaking into two
   * suites appears twice, each with that suite's own exact count.
   */
  def contaminationMatrix(train: DataFrame, suites: Seq[(String, DataFrame)],
                          textCol: String, idCol: String,
                          n: Int = 3): DataFrame = {
    require(suites.nonEmpty, "at least one eval suite")
    require(suites.map(_._1).distinct.size == suites.size,
      s"suite names must be unique: ${suites.map(_._1)}")
    val tagged = suites.map { case (name, df) =>
      ngramRows(df, textCol, idCol, "eval_id", n)
        .select(lit(name).as("suite"), col("gram")).distinct()
    }.reduce(_.unionByName(_))
    ngramRows(train, textCol, idCol, "doc_id", n).distinct()
      .join(broadcast(tagged), "gram")
      .groupBy("doc_id", "suite")
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
      .withColumnRenamed("doc_id", idCol)
  }

  /** The serialized Bloom sketch of an eval set's distinct `n`-grams —
    * the broadcastable decontamination artifact (numBits/8 bytes of
    * driver state regardless of eval-set size); built by ONE scan +
    * mergeable partial OR ([[graft.functions.BloomAgg]]). */
  def evalGramSketch(eval_ : DataFrame, textCol: String, idCol: String,
                     n: Int = 3, numBits: Int = 1 << 20,
                     numHashes: Int = 5): Array[Byte] =
    ngramRows(eval_, textCol, idCol, "eval_id", n)
      .select("gram").distinct()
      .agg(bloom_agg(xxhash64(col("gram")), lit(numBits), lit(numHashes)).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** ROW-LOCAL contamination screen against a pre-built eval sketch: per
    * document, the count of DISTINCT `n`-grams the Bloom filter cannot
    * rule out. Zero means PROVABLY CLEAN (no false negatives); positive
    * means quarantine-for-review (false positives possible at the
    * sketch's fpp). One pass inside the scan projection — no explode, no
    * join, no shuffle — which is what makes it the streaming ingest
    * gate's per-batch work ([[graft.streaming.ContaminationGate]]). */
  def suspectGramCount(text: Column, sketch: Array[Byte], n: Int = 3): Column =
    coalesce(size(filter(array_distinct(gramArray(text, n)),
      g => bloom_might_contain(xxhash64(g), sketch))), lit(0)).cast("long")

  /**
   * Leakage-safe train/val/test assignment by CONTENT hash: a document
   * lands in the same split in every dataset version, regardless of row
   * ids or ordering, because the split key is md5 of the text itself —
   * the standard guard against eval contamination when corpora are
   * re-crawled or re-sharded.
   *
   * Implementation detail: the first md5 byte is compared as its 2-char
   * lowercase-hex prefix (lexicographic hex order == numeric order), so
   * the assignment is a pure string expression identical in any engine.
   * Resolution is 1/256 — fractions round down to the nearest byte.
   */
  def contentHashSplit(df: DataFrame, textCol: String,
                       trainFrac: Double = 0.9, valFrac: Double = 0.05): DataFrame =
    df.withColumn("split", hashSplit(col(textCol), trainFrac, valFrac))

  /** The split-assignment column shared by [[contentHashSplit]] and
    * [[Dedup.clusterSafeSplit]]: md5 of the key expression, first byte
    * compared as its 2-char lowercase-hex prefix (lexicographic hex order
    * == numeric order), so the assignment is a pure string expression
    * identical in any engine. Resolution is 1/256 — fractions round down
    * to the nearest byte. */
  def hashSplit(key: Column, trainFrac: Double, valFrac: Double): Column = {
    require(trainFrac + valFrac <= 1.0, "train + val fractions exceed 1")
    // frac >= 1 must swallow EVERY byte including 0xff: "g" sorts after
    // any 2-char hex prefix, so the comparison stays a plain string test
    def hexThreshold(frac: Double): String = {
      val b = math.floor(frac * 256).toInt
      if (b >= 256) "g" else f"$b%02x"
    }
    // NULL keys hash as the empty string (the sibling samplers' coalesce
    // convention): without this, md5(NULL) is NULL, both when-branches
    // evaluate NULL, and EVERY null-keyed document silently lands in
    // 'test' — biasing the eval set instead of bucketing deterministically
    val b = substring(md5(coalesce(key.cast("string"), lit(""))), 1, 2)
    when(b < hexThreshold(trainFrac), "train")
      .when(b < hexThreshold(trainFrac + valFrac), "val")
      .otherwise("test")
  }

  /**
   * Within-document repetition signal (the Gopher-style quality filter):
   * the fraction of word `n`-grams that are duplicates of an earlier gram
   * in the SAME document — boilerplate, keyword stuffing, and degenerate
   * generations score high and get filtered before training. Row-local
   * (one array pipeline inside codegen, no shuffle); documents with fewer
   * than `n` tokens score 0.
   */
  def withRepetitionRatio(df: DataFrame, textCol: String, n: Int = 3): DataFrame =
    df.withColumn("__toks",
        filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0))
      .withColumn("__grams", expr(
        s"CASE WHEN size(__toks) >= $n THEN transform(sequence(1, size(__toks) - ${n - 1}), " +
          s"i -> array_join(slice(__toks, i, $n), ' ')) ELSE array() END"))
      .withColumn("dup_gram_ratio",
        when(size(col("__grams")) > 0,
          lit(1.0) - size(array_distinct(col("__grams"))).cast("double") / size(col("__grams")))
          .otherwise(lit(0.0)))
      .drop("__toks", "__grams")

  /**
   * PII redaction pass (email / SSN / payment-card / phone): the scrubbing
   * step a training corpus runs before anything is tokenized. Patterns are
   * deliberately RE2-compatible (no lookarounds), so the exact same regexes
   * run in any engine — which is what makes the pass SQL-oracle-able.
   *
   * Appends one `n_<kind>` count per pattern (matches in the ORIGINAL
   * text — sequential replacement can consume an inner match, e.g. a
   * 13-digit run inside an email local part, so counts are per-pattern
   * evidence, not substitution totals) and `text_redacted` with the
   * patterns replaced in [[PiiPatterns]] order. Row-local projection: no
   * shuffle, streams at scan speed.
   */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("card", "\\b\\d{13,16}\\b", "<CARD>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"))

  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val counted = PiiPatterns.foldLeft(df) { case (d, (kind, pat, _)) =>
      d.withColumn(s"n_$kind",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long"))
    }
    val redacted = PiiPatterns.foldLeft(col(textCol)) { case (c, (_, pat, tag)) =>
      regexp_replace(c, pat, tag)
    }
    counted.withColumn("text_redacted", redacted)
  }

  /**
   * Deterministic distributed sequence packing: lay documents back-to-back
   * in token space and cut fixed-`capacity` training sequences — the step
   * that turns a ragged document corpus into uniform LLM training rows.
   *
   * Scale shape: a single global ordering would funnel the cumsum through
   * one partition, so documents are first salted into `numGroups`
   * independent pack groups (`id % numGroups`) and packed by a window
   * cumsum WITHIN each group — `numGroups`-way parallel, deterministic
   * under any physical partitioning, and bins never cross groups (bin id =
   * bin-within-group * numGroups + group — collision-free for ANY bin
   * count, where a fixed per-group stride would fold two groups' bins
   * together once a group exceeds the stride: at 100 TB a 2048-capacity
   * group holds ~1e7 bins, far past any fixed 1e6). A document whose tokens straddle a bin
   * boundary spills into the next bin (`bin_offset` + its length >
   * capacity); the downstream batcher splits or truncates at material-
   * ization time, exactly like offset-based packing in production loaders.
   */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
                    capacity: Int = 2048, numGroups: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("pack_group")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), tokenCount(col(textCol)).cast("long").as("n_tokens"),
        pmod(col(idCol), lit(numGroups)).cast("long").as("pack_group"))
      .withColumn("tok_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin_id",
        floor(col("tok_offset") / capacity).cast("long") * lit(numGroups.toLong) +
          col("pack_group"))
      .withColumn("bin_offset", pmod(col("tok_offset"), lit(capacity.toLong)))
  }

  /**
   * NO-SPLIT sequence packing — the fine-tuning counterpart of
   * [[packSequences]]: documents are never cut at a bin boundary (an SFT
   * example truncated mid-conversation is a corrupted label), so bins are
   * packed next-fit-decreasing per salt group: docs in (tokens DESC, id)
   * order, a new bin opened when the current one cannot fit the next doc.
   * NFD's classic guarantee bounds waste: per group, bins used <= 2x the
   * optimal bin count (spec-pinned). A document LARGER than `capacity`
   * gets a bin of its own (the caller's oversize policy applies
   * downstream; nothing is silently cut here either).
   *
   * Scale shape: packing is prefix-sequential (each doc's bin depends on
   * every earlier fill), which decomposes across salt groups exactly like
   * [[packSequences]] — `id % numGroups` independent folds. Each fold is
   * ONE pass of O(1) state (current bin, fill) over its group's sorted
   * rows: the narrow (id, tokens, group) projection shuffles once to its
   * group, sorts within partitions, and a streaming mapPartitions fold
   * emits assignments — no buffering, no window, deterministic under any
   * input partitioning. Bin ids interleave as bin_in_group * numGroups +
   * group (collision-free for any bin count, the packSequences rule).
   *
   * NULL text packs as ZERO tokens (coalesced before the fold — the
   * typed fold cannot carry tokenCount's NULL-propagating convention, and
   * a null-text doc occupying no bin space is the right packing
   * semantics); `idCol` must be non-null, the engine-wide id contract.
   *
   * Output: (idCol, pack_group, n_tokens, bin_id, bin_offset).
   */
  def packSequencesNoSplit(df: DataFrame, textCol: String, idCol: String,
                           capacity: Int = 2048, numGroups: Int = 64): DataFrame = {
    require(capacity > 0 && numGroups > 0, "capacity and numGroups must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as(idCol),
        coalesce(tokenCount(col(textCol)).cast("long"), lit(0L)).as("n_tokens"),
        pmod(col(idCol), lit(numGroups)).cast("long").as("pack_group"))
      .as[(Long, Long, Long)]
    val packed = base
      .repartition(col("pack_group"))
      .sortWithinPartitions(col("pack_group"), col("n_tokens").desc, col(idCol))
      .mapPartitions { it =>
        // streaming NFD fold: rows arrive grouped by pack_group (sorted),
        // state resets on group change — O(1) memory per task
        var curGroup = -1L
        var bin = 0L
        var fill = 0L
        it.map { case (id, n, grp) =>
          if (grp != curGroup) { curGroup = grp; bin = 0L; fill = 0L }
          else if (fill + n > capacity) { bin += 1L; fill = 0L }
          val off = fill
          fill += n
          (id, grp, n, bin, off)
        }
      }
    packed.toDF(idCol, "pack_group", "n_tokens", "__bin", "bin_offset")
      .select(col(idCol), col("pack_group"), col("n_tokens"),
        (col("__bin") * numGroups + col("pack_group")).as("bin_id"),
        col("bin_offset"))
  }

  /**
   * Curriculum shard assignment: within each stratum, order documents by
   * a caller-supplied score (DESC, doc-id tiebreak) and greedy-pack them
   * IN THAT ORDER into fixed-token training shards — the data-ORDERING
   * step of curriculum schedules (Bengio et al. 2009; for the modern
   * "anneal on the best data last" recipe pass the negated score). Shard
   * 0 is the first-served mass; `shard_offset` is the document's token
   * offset inside its shard, so a downstream writer can emit shards
   * without re-sorting.
   *
   * Same fill-then-cut semantics as [[packSequences]]: a document is
   * assigned to the shard its PRECEDING cumulative mass falls in, so the
   * last document of a shard may straddle the boundary (cut downstream).
   *
   * Scale shape — two-level banded packing, NOT one window per stratum
   * (a per-stratum ordered window is one task sorting the whole stratum:
   * at 100 TB "the English partition" is the corpus). `floor(score *
   * scoreBands)` is monotone in score, so ordering by (band DESC, score
   * DESC, id) IS ordering by (score DESC, id) — the running sum
   * parallelizes across (stratum, band) tasks, and each document's global
   * offset is its within-band offset plus the exact prefix of
   * higher-band token totals (a strata x bands frame: census-sized,
   * cumulated per stratum, broadcast back). Output is bit-identical to
   * the single-window form at any banding. The narrow
   * (id, stratum, score, tokens) projection is localCheckpointed once —
   * ~1e-3 of corpus bytes (no text) — so the offsets window and the band
   * census share one text scan.
   *
   * Output: (idCol, stratum, score, n_tokens, shard_id, shard_offset).
   */
  def curriculumShards(df: DataFrame, textCol: String, idCol: String,
                       score: Column, stratum: Column,
                       shardTokens: Long, scoreBands: Int = 1024,
                       checkpoint: Boolean = true): DataFrame =
    curriculumShardsCounted(df, idCol, tokenCount(col(textCol)), score,
      stratum, shardTokens, scoreBands, checkpoint)

  /** [[curriculumShards]]' packing core over a frame that ALREADY carries
    * its token counts (`tokens` any long-able expression) — what lets a
    * composed pipeline (tx_curate_e2e) pack from a narrow scored frame
    * without a second pass over text. Same banded two-level machinery,
    * same output contract. */
  def curriculumShardsCounted(df: DataFrame, idCol: String, tokens: Column,
                              score: Column, stratum: Column,
                              shardTokens: Long, scoreBands: Int = 1024,
                              checkpoint: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shardTokens > 0, "shardTokens must be positive")
    require(scoreBands >= 1, "scoreBands must be >= 1")
    // __-prefixed internals: evaluate the caller's expressions against the
    // ORIGINAL columns, never a clobbered one (the mixtureSample rule)
    val base0 = df.select(col(idCol),
        tokens.cast("long").as("n_tokens"),
        score.as("__score"), stratum.as("__stratum"))
      // NULL scores band together at the bottom (both engines sort DESC
      // nulls-last) instead of null-keying out of the prefix join
      .withColumn("__band",
        when(col("__score").isNull, lit(Long.MinValue))
          .otherwise(floor(col("__score") * scoreBands).cast("long")))
    val base = if (checkpoint) base0.localCheckpoint() else base0
    val wBand = Window.partitionBy(col("__stratum"), col("__band"))
      .orderBy(col("__score").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOff = base
      .withColumn("__boff", coalesce(sum(col("n_tokens")).over(wBand), lit(0L)))
    // exact prefix of HIGHER bands' token mass, per stratum: a census-sized
    // frame (strata x occupied bands), cumulated band-descending, broadcast
    val wPrefix = Window.partitionBy(col("__stratum"))
      .orderBy(col("__band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = base.groupBy(col("__stratum"), col("__band"))
      .agg(sum(col("n_tokens")).as("__btot"))
      .withColumn("__bprefix", coalesce(sum(col("__btot")).over(wPrefix), lit(0L)))
      .drop("__btot")
    withOff.join(broadcast(prefixes), Seq("__stratum", "__band"))
      .withColumn("__off", col("__bprefix") + col("__boff"))
      .select(col(idCol), col("__stratum").as("stratum"),
        col("__score").as("score"), col("n_tokens"),
        floor(col("__off") / shardTokens).cast("long").as("shard_id"),
        pmod(col("__off"), lit(shardTokens)).as("shard_offset"))
  }

  /**
   * Token-exact shard SLICES — the materialization step
   * [[curriculumShards]] only assigns: every document becomes one slice
   * row per training shard it touches, with boundary-straddling documents
   * SPLIT at the exact token where the shard fills (the "cut downstream"
   * the assignment's fill-then-cut semantics promises). Concatenating a
   * shard's slices in `slice_offset` order reproduces the single-window
   * oracle fold bit-for-bit: sort each stratum by (score DESC, id), lay
   * tokens end to end, cut every `shardTokens` (spec-pinned).
   *
   * Scale shape: the assignment frame is narrow (no text); text joins
   * back by id ONCE (gone with an id-bucketed corpus layout), and the
   * straddle split is a row-local explode over the 1–2+ shards a document
   * spans (a document spans > 2 only when longer than a whole shard) with
   * [[chunkDocuments]]' slice machinery cutting the token window. No
   * exchange carries text except the id join; shard assembly downstream
   * groups by (stratum, shard_id) — each group is one shard's content,
   * bounded by `shardTokens`.
   *
   * Tokens are `split(trim(text), "\s+")` — the [[tokenCount]] kernel the
   * assignment counted with, so slice arithmetic is exact by construction.
   * Zero-token documents contribute no slices.
   *
   * Output: (idCol, stratum, shard_id, slice_offset, slice_tokens,
   * slice_text) — `slice_offset` the slice's token offset INSIDE its
   * shard, `slice_tokens` its length.
   */
  def curriculumShardSlices(df: DataFrame, textCol: String, idCol: String,
                            score: Column, stratum: Column,
                            shardTokens: Long, scoreBands: Int = 1024,
                            checkpoint: Boolean = true): DataFrame =
    shardSlicesFromAssignment(
      curriculumShards(df, textCol, idCol, score, stratum, shardTokens,
        scoreBands, checkpoint),
      df, textCol, idCol, shardTokens)

  /** The straddle-split core over a PRE-COMPUTED assignment frame
    * (idCol, stratum, n_tokens, shard_id, shard_offset) — what lets a
    * pipeline that already decided its packing ([[graft.operators
    * .Curation.curateBatch]]) materialize shard files without re-running
    * the offset windows. `texts` supplies the documents' text by id and
    * MUST cover every assignment id: an assignment row with no text row
    * would otherwise silently vanish while later slices keep their
    * offsets, assembling a shard shorter than its offsets claim with no
    * error. The join is therefore LEFT with a fail-fast guard — a
    * coverage gap raises instead of corrupting shard content. */
  def shardSlicesFromAssignment(assign: DataFrame, texts: DataFrame,
                                textCol: String, idCol: String,
                                shardTokens: Long): DataFrame = {
    val toks = texts.select(col(idCol),
      when(length(trim(col(textCol))) === 0,
        array().cast("array<string>"))
        .otherwise(split(trim(col(textCol)), "\\s+")).as("__toks"))
    assign.filter(col("n_tokens") > 0)
      .withColumn("__docoff",
        col("shard_id") * lit(shardTokens) + col("shard_offset"))
      .join(toks, Seq(idCol), "left")
      .withColumn("__toks",
        when(col("__toks").isNull,
          raise_error(concat(lit("shardSlicesFromAssignment: no text row for "
            + idCol + "="), col(idCol).cast("string"))))
          .otherwise(col("__toks")))
      .withColumn("__shard", explode(sequence(col("shard_id"),
        floor((col("__docoff") + col("n_tokens") - 1) / lit(shardTokens))
          .cast("long"))))
      // slice bounds in DOC token space: [b, e)
      .withColumn("__b",
        greatest(col("__shard") * lit(shardTokens) - col("__docoff"), lit(0L)))
      .withColumn("__e",
        least((col("__shard") + 1) * lit(shardTokens),
          col("__docoff") + col("n_tokens")) - col("__docoff"))
      .select(col(idCol), col("stratum"),
        col("__shard").as("shard_id"),
        greatest(col("__docoff") - col("__shard") * lit(shardTokens), lit(0L))
          .as("slice_offset"),
        (col("__e") - col("__b")).as("slice_tokens"),
        array_join(
          slice(col("__toks"), (col("__b") + 1).cast("int"),
            (col("__e") - col("__b")).cast("int")),
          " ").as("slice_text"))
  }

  /**
   * Assembled shard CONTENT: one row per (stratum, shard_id) with the
   * shard's full text — slices concatenated in offset order — and its
   * token count. Every shard is exactly `shardTokens` long except each
   * stratum's last (spec-pinned). One row per shard is the right
   * granularity: a shard is a training FILE, sized by `shardTokens`
   * (the caller's file-size knob), so the row is bounded no matter the
   * corpus size.
   */
  def curriculumShardTexts(df: DataFrame, textCol: String, idCol: String,
                           score: Column, stratum: Column,
                           shardTokens: Long, scoreBands: Int = 1024,
                           checkpoint: Boolean = true): DataFrame =
    assembleShardTexts(curriculumShardSlices(df, textCol, idCol, score,
      stratum, shardTokens, scoreBands, checkpoint))

  /** Slice rows -> one bounded row per (stratum, shard_id): slices
    * concatenated in offset order, plus the shard's token count. Shared
    * by [[curriculumShardTexts]] and [[graft.operators.Curation
    * .writeCuratedShards]] so the assembly rule cannot drift. */
  def assembleShardTexts(slices: DataFrame): DataFrame =
    slices.groupBy(col("stratum"), col("shard_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("slice_offset").as("o"),
              col("slice_text").as("t")))),
            x => x.getField("t")),
          " ").as("shard_text"),
        sum(col("slice_tokens")).as("shard_tokens"))

  /** Write assembled shard rows as one text file per (stratum, shard_id)
    * under `outDir/stratum=<s>/shard_id=<n>/` — hive-partitioned so a
    * training loader lists shards by directory. `repartition` on the
    * partition keys puts each shard's single row in its own task, hence
    * ONE file per shard dir. */
  def writeShardTexts(shards: DataFrame, outDir: String): Unit =
    shards
      .repartition(col("stratum"), col("shard_id"))
      .select(col("stratum"), col("shard_id"), col("shard_text"))
      .write.mode("overwrite").partitionBy("stratum", "shard_id")
      .text(outDir)

  /** The shard WRITER: [[curriculumShardTexts]] through
    * [[writeShardTexts]]. */
  def writeCurriculumShards(df: DataFrame, textCol: String, idCol: String,
                            score: Column, stratum: Column,
                            shardTokens: Long, outDir: String,
                            scoreBands: Int = 1024): Unit =
    writeShardTexts(curriculumShardTexts(df, textCol, idCol, score, stratum,
      shardTokens, scoreBands), outDir)

  /**
   * Context-window chunking: split each document into `chunkTokens`-token
   * chunks whose starts advance by `stride` tokens (stride < chunkTokens
   * gives overlapping chunks, the RAG/pretraining windowing shape). Emits
   * one row per chunk: (id, chunk_idx, chunk_start, n_chunk_tokens,
   * chunk_text). Documents with zero tokens emit no chunks.
   *
   * Scale shape: a row-local tokenize + sequence + explode — no shuffle,
   * no window; chunk boundaries depend only on the document itself, so the
   * pass is embarrassingly parallel at any corpus size.
   */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
                     chunkTokens: Int = 64, stride: Int = 48): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    df.select(col(idCol),
        filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        col("__toks"),
        posexplode(sequence(lit(0), size(col("__toks")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "chunk_start")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_start").cast("long").as("chunk_start"),
        least(lit(chunkTokens), size(col("__toks")) - col("chunk_start"))
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("chunk_start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /**
   * Deterministic stratified sample: at most `k` documents per stratum,
   * selected by content hash — the corpus-balancing step ("cap every
   * language/domain at k docs") reproducible across runs, row order, and
   * engines, because rank depends only on document content (md5 hex sorts
   * identically everywhere; `idCol` breaks exact-duplicate-text ties).
   *
   * Scale shape: one narrow (stratum, hash, id) shuffle; the per-stratum
   * top-k window is rank-limited (WindowGroupLimit pushes k into the sort),
   * and payloads rejoin by id only for sampled rows if the caller needs
   * them.
   */
  def stratifiedSample(df: DataFrame, textCol: String, idCol: String,
                       stratum: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // coalesce before hashing: a NULL text would sort NULLS FIRST in Spark
    // but NULLS LAST in most SQL engines — md5('') is engine-agnostic
    // __stratum internal name (the __h/__toks convention, same as the other
    // three samplers): the caller's expression is evaluated ONCE against the
    // original columns, and a frame that already carries a `stratum` column
    // can never collide with the window key. An idCol literally NAMED
    // "stratum" would still leave two same-named output columns after the
    // final rename — reject it up front instead of emitting an ambiguous
    // frame.
    require(idCol != "stratum",
      "stratifiedSample: idCol must not be named 'stratum' (output carries a 'stratum' column)")
    val w = Window.partitionBy(col("__stratum"))
      .orderBy(col("__h").asc, col(idCol).asc)
    df.select(col(idCol), stratum.as("__stratum"),
        md5(coalesce(col(textCol), lit(""))).as("__h"))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .drop("__h")
      .withColumnRenamed("__stratum", "stratum")
  }

  /**
   * Deterministic mixture resampling: downsample each stratum at its own
   * rate — the data-mixing step that turns measured per-language/domain
   * token counts into a target training mixture. A document is kept iff the
   * first 4 hex chars of md5(text) sort below the stratum's rate threshold
   * (resolution 1/65536, rounded down), so like [[contentHashSplit]] the
   * decision is a pure function of CONTENT: stable across runs, engines,
   * row order, and corpus re-shardings, and a stratum's kept set at rate r
   * is a SUBSET of its kept set at any higher rate (nested samples —
   * re-mixing never resurrects previously dropped documents' neighbors
   * arbitrarily).
   *
   * Strata absent from `rates` keep `defaultRate`. Row-local projection +
   * filter: no shuffle, no window, streams at scan speed.
   */
  def mixtureSample(df: DataFrame, textCol: String, stratum: Column,
                    rates: Map[String, Double],
                    defaultRate: Double = 1.0): DataFrame = {
    def hexThreshold(rate: Double): String = {
      require(rate >= 0 && rate <= 1, s"rate $rate outside [0, 1]")
      val b = math.floor(rate * 65536).toInt
      if (b >= 65536) "g" else f"$b%04x" // "g" sorts after every hex prefix
    }
    // __stratum internal name (the __h/__toks convention): the caller's
    // expression is evaluated ONCE against the original columns — a plain
    // withColumn("stratum", ...) would clobber any pre-existing stratum
    // column BEFORE the filter re-evaluates expressions referencing it
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (k, r)) => when(col("__stratum") === k, lit(hexThreshold(r))).otherwise(acc)
    }
    // coalesce: a NULL text must follow its stratum's rate like any other
    // document (a raw NULL hash would silently drop it at every rate)
    df.withColumn("__stratum", stratum)
      .filter(substring(md5(coalesce(col(textCol), lit(""))), 1, 4) < thr)
      .drop("stratum")
      .withColumnRenamed("__stratum", "stratum")
  }

  /**
   * Quality-quantile admission: keep the best `keepFrac` of each stratum by
   * `scoreCol` — the relative quality gate ("top 25% per language") that
   * adapts to per-language score distributions instead of one global
   * threshold. Rank ties are broken by `idCol` so the kept set is
   * deterministic. percent_rank is (rank-1)/(n-1): strata with one row
   * score 0.0 and are kept.
   *
   * Scale shape: one narrow (stratum, score, id) shuffle + window; no
   * global sort, no driver-side quantile collection.
   */
  def qualityQuantileFilter(df: DataFrame, scoreCol: String, idCol: String,
                            stratum: Column, keepFrac: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keepFrac > 0 && keepFrac <= 1, "keepFrac must be in (0, 1]")
    // __stratum: evaluate the caller's expression against the ORIGINAL
    // columns, never a clobbered one (see mixtureSample)
    val w = Window.partitionBy(col("__stratum"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("__stratum", stratum)
      .withColumn("quality_pr", percent_rank().over(w))
      .filter(col("quality_pr") <= keepFrac)
      .drop("stratum")
      .withColumnRenamed("__stratum", "stratum")
  }

  /**
   * UniMax mixture allocation (Chung et al., ICLR 2023): distribute a
   * training-token budget across strata (domains/languages/sources) as
   * UNIFORMLY as possible subject to a per-stratum repeat cap — the
   * published fix for both proportional sampling (head domains drown the
   * tail) and plain uniform sampling (tail domains get epoched into
   * memorization). Stratum d with n_d corpus tokens may contribute at
   * most cap_d = maxEpochs * n_d; the budget B = budgetFrac * Σ n_d is
   * water-filled: strata whose cap sits below the uniform share are
   * SATURATED at their cap, and the leftover is split evenly across the
   * rest. Exact closed form over the cap-ascending order (c_1 ≤ … ≤ c_D):
   * stratum i saturates iff c_i * (D - i + 1) + Σ_{j<i} c_j ≤ B, and the
   * unsaturated share is (B − Σ_sat c_j) / #unsat — one window pass, no
   * iteration.
   *
   * Determinism: censuses are exact integers; the only doubles are B and
   * the final share/epochs divisions — identical IEEE ops in any engine
   * (the oracle replays the same window + CASE). Ties in the cap order
   * break by stratum name.
   *
   * Scale shape: the per-stratum census is ONE map-side-combined
   * aggregation (narrow (stratum, count) rows); everything after runs on
   * D rows — strata counts are small by definition (languages, sources),
   * so the single-partition window is driver-sized, the same contract as
   * [[Bm25.search]]'s final top-k.
   */
  def unimaxAllocation(df: DataFrame, textCol: String, stratum: Column,
                       budgetFrac: Double = 1.5, maxEpochs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetFrac > 0, "budgetFrac must be positive")
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    val per = df.groupBy(stratum.as("stratum"))
      .agg(sum(tokenCount(col(textCol)).cast("long")).as("n_tokens"))
      .withColumn("cap", col("n_tokens") * maxEpochs)
    val totals = per.agg(sum("n_tokens").as("total"), count(lit(1)).as("d"))
    val w = Window.orderBy(col("cap").asc, col("stratum").asc)
    val ranked = per.crossJoin(broadcast(totals))
      .withColumn("budget", lit(budgetFrac) * col("total").cast("double"))
      .withColumn("i", row_number().over(w))
      .withColumn("prefix",
        coalesce(sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("saturated",
        (col("cap") * (col("d") - col("i") + 1) + col("prefix")).cast("double")
          <= col("budget"))
    val satTotals = ranked.agg(
      coalesce(sum(when(col("saturated"), col("cap"))), lit(0L)).as("sum_sat"),
      sum(when(!col("saturated"), 1L).otherwise(0L)).as("n_unsat"))
    ranked.crossJoin(broadcast(satTotals))
      .withColumn("alloc_tokens",
        when(col("saturated"), col("cap").cast("double"))
          .otherwise((col("budget") - col("sum_sat").cast("double"))
            / col("n_unsat").cast("double")))
      .withColumn("epochs", col("alloc_tokens") / col("n_tokens").cast("double"))
      .select("stratum", "n_tokens", "cap", "saturated", "alloc_tokens", "epochs")
  }

  /**
   * Materialize a mixture allocation into PER-DOCUMENT epoch repeat
   * counts — the step that turns [[unimaxAllocation]] /
   * [[temperatureMix]]'s per-stratum token budgets into a physical
   * training list: every document of stratum s repeats
   * `floor(alloc_s / tokens_s)` times, and a CONTENT-HASH-selected
   * fraction of the stratum repeats once more so the realized token mass
   * meets the fractional epoch (the standard "2.37 epochs of source X"
   * materialization).
   *
   * The fractional selection is deterministic and engine-exact: a
   * document's 16-bit uniform is the first 4 hex chars of md5(text) (the
   * [[hashSplit]] convention at higher resolution), selected iff
   * u < floor(rem * 65536 / tokens_s) — all integer arithmetic, so the
   * DuckDB oracle replays it bit-for-bit. Quantization bounds the
   * realized-mass error at tokens_s / 65536 (0.0015%); the integer
   * products stay in range for strata under 2^47 tokens (≈ 500× a full
   * 100 TB corpus).
   *
   * Selection is by CONTENT hash, not id: re-sharding or re-ingesting
   * the corpus reproduces the same repeat list, the same property the
   * split assignment rides.
   *
   * Scale shape: one corpus scan for the narrow (id, stratum, tokens,
   * u16) projection; the stratum census and the allocation join are
   * census-sized and broadcast back. Zero-token strata materialize NULL
   * repeats (no token mass to repeat — the allocation upstream already
   * allocated them nothing meaningful). NULL strata canonicalize to the
   * string `'<NULL>'` on BOTH sides before any join (the
   * [[graft.operators.DataQuality.kAnonymityEnforce]] rule — a NULL key
   * would silently fall out of the equi-joins and DROP those documents),
   * and documents whose stratum carries NO allocation row keep their row
   * with NULL `n_repeats` instead of vanishing — a partial allocation is
   * a visible decision, not a filter.
   *
   * Output: (idCol, stratum, n_tokens, n_repeats) — one row per input
   * document, stratum as a string.
   *
   * @param alloc per-stratum budgets: (stratum, alloc_tokens: long) —
   *              [[temperatureMix]]'s output works directly.
   */
  def epochMaterialize(df: DataFrame, textCol: String, idCol: String,
                       stratum: Column, alloc: DataFrame): DataFrame = {
    def canon(c: Column) = coalesce(c.cast("string"), lit("<NULL>"))
    val base = df.select(col(idCol), canon(stratum).as("stratum"),
      tokenCount(col(textCol)).cast("long").as("n_tokens"),
      conv(substring(md5(coalesce(col(textCol), lit(""))), 1, 4), 16, 10)
        .cast("long").as("__u"))
    val per = base.groupBy("stratum").agg(sum("n_tokens").as("__s_tokens"))
    val allocCanon = alloc.select(canon(col("stratum")).as("stratum"),
      col("alloc_tokens"))
    val plan = per.join(allocCanon, "stratum")
      .withColumn("__full", expr("div(alloc_tokens, nullif(__s_tokens, 0))"))
      .withColumn("__rem", pmod(col("alloc_tokens"), nullif(col("__s_tokens"), lit(0L))))
      .withColumn("__thresh", expr("div(__rem * 65536, __s_tokens)"))
    base.join(broadcast(plan), Seq("stratum"), "left")
      .select(col(idCol), col("stratum"), col("n_tokens"),
        (col("__full") +
          when(col("__u") < col("__thresh"), 1L).otherwise(0L)).as("n_repeats"))
  }

  /**
   * The PHYSICAL epoch stream: expand [[epochMaterialize]]'s per-document
   * repeat counts into one row per (document, repeat) and key every copy
   * with a content-derived shuffle hash — the step that turns "2.37
   * epochs of source X" from an assignment column into an actual
   * training order. The key is `md5(seed:rep:text)` — the
   * [[graft.sources.ShuffledExport]] convention with the repeat index
   * salted in — so the two copies of a twice-repeated document land at
   * independent positions, the global KEY order is a pure function of
   * (seed, corpus) (re-running, re-sharding or re-NUMBERING the corpus
   * reproduces it; ids never enter a key), and DuckDB replays every key
   * bit-for-bit. Two documents with identical text and the same rep carry
   * identical keys; [[writeEpochStream]] breaks that tie with a secondary
   * (id, rep) sort, so the materialized ROW order is deterministic for a
   * fixed corpus (tie order follows ids — the one place renumbering can
   * swap rows, and only between content-identical copies).
   *
   * Scale shape: the repeat explosion runs on the NARROW assignment
   * frame (id, stratum, n_tokens, rep) and text joins in ONCE,
   * POST-explode (plan-pinned) — so the id-keyed join exchange carries
   * each document's text at most once, never multiplied by its repeat
   * count. Repeat counts are epochs-per-stratum (single digits for any
   * sane mixture), so the exploded assignment stays O(epochs · |docs|)
   * narrow rows. Only [[writeEpochStream]]'s final range exchange
   * carries the physical copies — that exchange IS the materialization
   * (each copy must reach its shuffle position), and it is the scalable
   * `repartitionByRange + sortWithinPartitions` total order, not a
   * single-task sort.
   *
   * Output: one row per (document, repeat) with `rep` in [1, n_repeats]
   * — (idCol, stratum, n_tokens, rep, shuffle_key, textCol). Row count
   * = Σ n_repeats; documents with NULL or zero repeats emit nothing.
   */
  def epochStream(df: DataFrame, textCol: String, idCol: String,
                  stratum: Column, alloc: DataFrame,
                  seed: Long = 0L): DataFrame = {
    val expanded = epochMaterialize(df, textCol, idCol, stratum, alloc)
      .filter(col("n_repeats") >= 1L)
      .withColumn("rep", explode(sequence(lit(1L), col("n_repeats"))))
      .select(col(idCol), col("stratum"), col("n_tokens"), col("rep"))
    expanded.join(df.select(col(idCol), col(textCol)), Seq(idCol))
      .withColumn("shuffle_key",
        md5(concat(lit(seed.toString), lit(":"), col("rep").cast("string"),
          lit(":"), coalesce(col(textCol), lit("")))))
  }

  /** Materialize [[epochStream]] as training files in global shuffle
    * order: a sampled range exchange on the content key plus
    * per-partition sorts — a TOTAL order across output files (every key
    * in part i precedes every key in part i+1) without funneling the
    * stream through one task.
    *
    * KEY-TIE determinism: two documents with identical text and the same
    * rep produce identical md5 keys (the key is content-derived on
    * purpose — ids never enter it, so renumbering the corpus reproduces
    * the key sequence). Their RELATIVE order is fixed by a secondary
    * (idCol, rep) sort WITHIN partitions — equal keys always land in the
    * same range partition (RangePartitioner buckets on the key alone), so
    * the whole output order is deterministic for a fixed corpus while the
    * keys themselves stay id-renumber-invariant. */
  def writeEpochStream(df: DataFrame, textCol: String, idCol: String,
                       stratum: Column, alloc: DataFrame, outDir: String,
                       seed: Long = 0L, numFiles: Int = 32): Unit =
    epochStream(df, textCol, idCol, stratum, alloc, seed)
      .repartitionByRange(numFiles, col("shuffle_key"))
      .sortWithinPartitions(col("shuffle_key"), col(idCol), col("rep"))
      .write.mode("overwrite").parquet(outDir)

  /**
   * Temperature-based mixture allocation (the multilingual alpha-sampling
   * of mBERT/XLM-R/mT5): sample stratum i with probability proportional to
   * p_i^alpha at alpha = 0.5, flattening the natural distribution so
   * low-resource strata are upsampled without UniMax's hard epoch cap —
   * the OTHER standard answer to head-language dominance
   * (vs [[unimaxAllocation]]).
   *
   * Exactness: with alpha = 1/2, p_i^alpha ∝ sqrt(n_tokens_i), and IEEE
   * sqrt is correctly rounded — so `w_fp = floor(sqrt(n_tokens))` is the
   * same integer in any engine, and every downstream step is integer
   * floor-division on the 2^20 lattice (exact, engine-independent; a
   * general-alpha variant would ride [[graft.functions.FpMath]]'s log2
   * lattice instead, since `pow` carries no correct-rounding guarantee).
   *
   * Scale shape: one partial-aggregated groupBy to |strata| rows; the
   * weight total comes from a global window over that ALREADY-AGGREGATED
   * k-row frame (the ev_growth convention — rows = strata, bounded by the
   * number of sources/languages), so the corpus is scanned exactly ONCE
   * and no exchange is data-sized. (A `per.agg(...)` + crossJoin total
   * would plan a second full scan: the totals side prunes the partial
   * aggregate differently, defeating exchange reuse.)
   *
   * Output per stratum: (stratum, n_docs, n_tokens, w_fp,
   * alloc_tokens = floor(budget * w_fp / sum w_fp),
   * epochs_fp = floor(alloc_tokens * 2^20 / n_tokens), NULL for an
   * empty-token stratum).
   */
  def temperatureMix(df: DataFrame, textCol: String, stratum: Column,
                     budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetTokens > 0, "budgetTokens must be positive")
    val wGlobal = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("n_tokens"))
      .withColumn("w_fp", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
      .withColumn("w_total", sum("w_fp").over(wGlobal))
      .select(col("stratum"), col("n_docs"), col("n_tokens"), col("w_fp"),
        expr(s"div($budgetTokens * w_fp, w_total)").as("alloc_tokens"))
      .withColumn("epochs_fp",
        expr("div(alloc_tokens * 1048576, nullif(n_tokens, 0))"))
  }

  /**
   * Token-budget fill: admit each stratum's best documents (by `scoreCol`,
   * ties to `idCol`) until the stratum's token budget is exhausted — the
   * final corpus-sizing step ("2B tokens of English, 500M of code") that
   * turns quality ranking plus mixture targets into an actual training set.
   *
   * A document is kept while the tokens admitted BEFORE it are under
   * budget, so the last kept document may overflow the budget by a partial
   * document (standard fill-then-cut semantics; pair with
   * [[packSequences]] downstream to cut exact sequences). Documents with
   * more tokens than the whole budget can therefore only be admitted from
   * rank 1.
   *
   * Scale shape: one narrow (stratum, score, id, n_tokens) shuffle and a
   * per-stratum running sum — parallel across strata like [[packSequences]]'
   * pack groups; no global ordering, no driver-side accumulation.
   */
  def tokenBudgetFill(df: DataFrame, textCol: String, idCol: String,
                      scoreCol: String, stratum: Column,
                      budgets: Map[String, Long],
                      defaultBudget: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // __stratum: evaluate the caller's expression against the ORIGINAL
    // columns, never a clobbered one (see mixtureSample)
    val w = Window.partitionBy(col("__stratum"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (k, b)) => when(col("__stratum") === k, lit(b)).otherwise(acc)
    }
    df.withColumn("__stratum", stratum)
      .withColumn("n_tokens", tokenCount(col(textCol)).cast("long"))
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("tokens_before") < budget)
      .drop("stratum")
      .withColumnRenamed("__stratum", "stratum")
  }

  /** Language-ID + fingerprint profile of a documents table. */
  def profile(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      lang_id(col(textCol)).as("lang_pred"),
      tokenCount(col(textCol)).as("n_tokens"),
      simhash64(col(textCol)).as("simhash"),
      rolling_fingerprint(col(textCol), lit(16)).as("fingerprint"))

  /**
   * PMI-ranked bigram collocations — the corpus-level "statistically
   * glued" phrase detector (stopword-pair suppression, tokenizer-merge
   * candidates, domain-vocabulary mining). Ranks adjacent word pairs by
   * pointwise mutual information's monotone lift form:
   *
   *   lift(w1,w2) = P(w1,w2) / (P(w1)·P(w2))
   *               = (pair_n/T_p) · (T_u/c1) · (T_u/c2)
   *
   * computed as that exact FIXED-ASSOCIATION double expression — three
   * correctly-rounded divisions and two multiplications in a pinned order
   * — so the value (and therefore the top-k cut) is bit-identical across
   * engines; `log` (not correctly rounded, engine-divergent) never enters.
   * Counts are corpus occurrence counts; `minPairCount` suppresses the
   * noise tail (a 1-occurrence pair of two hapaxes has maximal lift).
   *
   * Scale shape: one token explode into two aggregates (pair counts, word
   * counts); pair->word joins are vocabulary-keyed equi-joins (vocab is
   * Zipf-bounded, shrunk further by `minPairCount` on the probe side);
   * totals ride a broadcast 1-row frame; the final top-k is a
   * TakeOrdered(k), never a full sort. Document payloads leave the plan at
   * the explode.
   */
  def pmiCollocations(df: DataFrame, textCol: String,
                      minPairCount: Long = 5L, topK: Int = 50): DataFrame = {
    val toks = df.select(
      filter(split(lower(trim(col(textCol))), "\\s+"),
        t => length(t) > 0).as("ts"))
    val uni = toks.select(explode(col("ts")).as("w"))
    val pairs = toks.filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(slice(ts, 1, size(ts) - 1), (w, i) -> struct(w AS w1, ts[i + 1] AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uc = uni.groupBy("w").agg(count(lit(1)).as("c"))
    val pc = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minPairCount)
    val totals = uni.agg(count(lit(1)).as("tu"))
      .crossJoin(pairs.agg(count(lit(1)).as("tp")))
    pc
      .join(uc.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uc.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("pair_n"), col("c1"), col("c2"),
        // fixed association replayed verbatim by the SQL oracle
        (((col("pair_n").cast("double") / col("tp")) *
          (col("tu").cast("double") / col("c1"))) *
          (col("tu").cast("double") / col("c2"))).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
