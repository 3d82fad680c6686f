package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/**
 * SparkSessionExtensions entry point — installs the engine's expression
 * library into any session the idiomatic Spark way:
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 *   // or
 *   SparkSession.builder().withExtensions(new GraftExtensions()(_))
 * }}}
 *
 * after which `SELECT fuzz_ratio(a, b) FROM t` works in plain SQL on every
 * executor with whole-stage codegen. [[graft.functions.registerAll]] remains
 * the per-session programmatic equivalent.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    // the full constructor — the short (className, db, name, usage, extended)
    // overload is deprecated since Spark 3.0
    new ExpressionInfo("graft", null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(b: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), b))

    // kernel-algebra simplification: reflexive similarity calls fold to
    // their constant (see graft.plans.KernelSimplification for the guards)
    ext.injectOptimizerRule(_ => graft.plans.KernelSimplification)

    inject("fuzz_ratio", "indel similarity ratio 0..100")(a => FuzzRatio(a(0), a(1)))
    inject("fuzz_partial_ratio", "best-window indel ratio 0..100")(a => FuzzPartialRatio(a(0), a(1)))
    inject("fuzz_token_set_ratio", "token-set indel ratio 0..100")(a => FuzzTokenSetRatio(a(0), a(1)))
    inject("fuzz_token_sort_ratio", "token-sort indel ratio 0..100")(a => FuzzTokenSortRatio(a(0), a(1)))
    inject("soundex_jf", "American Soundex, digit-safe")(a => SoundexJf(a(0)))
    inject("metaphone", "Metaphone (Philips 1990) phonetic code")(a => MetaphoneExpr(a(0)))
    inject("unicode_normalize", "Unicode NFC/NFD/NFKC/NFKD normalization")(a => UnicodeNormalize(a(0), a(1)))
    inject("lang_id", "n-gram language-ID heuristic")(a => LangId(a(0)))
    inject("simhash64", "64-bit SimHash fingerprint")(a => SimHash64(a(0)))
    inject("rolling_fingerprint", "rolling-hash document fingerprint")(a => RollingFingerprint(a(0), a(1)))
    inject("minhash_sig", "MinHash signature over word shingles")(a => MinHashSig(a(0), a(1), a(2)))
    inject("lsh_bands", "LSH band keys of a minhash signature")(a => LshBands(a(0), a(1)))
    inject("ngram_jaccard", "exact word-shingle Jaccard similarity")(a => NGramJaccard(a(0), a(1), a(2)))
    inject("shingle_set", "distinct word-shingle hashes, ascending")(a => ShingleSet(a(0), a(1)))
    inject("word_shingles", "ordered word-shingle hashes, duplicates preserved")(a => WordShingles(a(0), a(1)))
    inject("cosine_sim", "cosine similarity of float arrays")(a => CosineSim(a(0), a(1)))
    inject("hyperplane_bucket", "sign-bit LSH bucket of hyperplane projections")(a => HyperplaneBucket(a(0), a(1), a(2)))
    inject("topk_by", "bounded-heap top-k aggregate: k best (ord, id) pairs per group")(
      a => TopKByOrd(a(0), a(1), a(2)).toAggregateExpression())
    inject("heavy_hitters", "Misra-Gries heavy-hitters summary: at most k (item, est) counters per group")(
      a => HeavyHittersAgg(a(0), a(1)).toAggregateExpression())
  }
}
