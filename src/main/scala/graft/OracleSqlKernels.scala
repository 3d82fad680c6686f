package graft

/**
 * DuckDB-SQL generators replicating the engine's text-hash kernels
 * ([[graft.functions.TextAlgos]]) bit-for-bit, so the custom-kernel dedup /
 * profiling queries can be hash-verified by the driver's DuckDB oracle
 * instead of falling back to rows-only checks.
 *
 * Technique: 64-bit wrapping arithmetic is emulated with HUGEINT (128-bit)
 * intermediates — a plain `a*b` of two 64-bit values can overflow HUGEINT,
 * so multiplication is split into 32-bit limbs ([[mulmod64]]). Lambda
 * captures (`list_transform([x], v -> ...)`) bind intermediates once,
 * keeping generated SQL linear in kernel size instead of exponential.
 *
 * The generators mirror, in order: FNV-1a 64 (TextAlgos.fnv1a64), the
 * murmur3 finalizer mix (TextAlgos.mix64), whitespace tokens
 * (TextAlgos.tokens), and signed-long reinterpretation (Scala Long
 * comparisons are SIGNED — minima must be taken after conversion).
 */
object OracleSqlKernels {

  val U64: String = "18446744073709551616" // 2^64
  val I64Max: String = "9223372036854775808" // 2^63

  /** Bind `expr` to `v` once inside `body` (single-element list_transform). */
  def bind(expr: String, v: String, body: String): String =
    s"list_transform([$expr], $v -> $body)[1]"

  /** (a * b) mod 2^64 for a: UBIGINT expression, b: 64-bit constant —
    * split into 32-bit limbs so no HUGEINT intermediate exceeds 2^97. */
  def mulmod64(a: String, b: String): String =
    s"""CAST(((CAST($a AS HUGEINT) % 4294967296) * $b + ((CAST($a AS HUGEINT) // 4294967296) * $b % 4294967296) * 4294967296) % $U64 AS UBIGINT)"""

  private def xsr33(z: String): String = s"xor($z, $z >> 33)"

  /** murmur3 finalizer (TextAlgos.mix64) over a UBIGINT expression. */
  def mix64(e: String): String =
    bind(e, "mz",
      bind(mulmod64(xsr33("mz"), "18397679294719823053"), "mz1",
        bind(mulmod64(xsr33("mz1"), "14181476777654086739"), "mz2", xsr33("mz2"))))

  /** FNV-1a 64 of a VARCHAR expression (TextAlgos.fnv1a64), as UBIGINT.
    * The FNV prime (2^40) keeps h*prime within HUGEINT without limbing.
    * ord() = the char's codepoint = Scala's charAt for the BMP/ASCII text
    * this engine profiles. */
  def fnv1a64(strExpr: String): String =
    s"""CAST(list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT), list_transform(string_split($strExpr, ''), c -> CAST(ord(c) AS UBIGINT))), (h, c) -> CAST((CAST(xor(h, c) AS HUGEINT) * 1099511628211) % $U64 AS UBIGINT)) AS UBIGINT)"""

  /** UBIGINT -> signed BIGINT (two's-complement reinterpretation). */
  def toSigned(u: String): String =
    s"CAST(CASE WHEN $u >= $I64Max THEN CAST($u AS HUGEINT) - $U64 ELSE CAST($u AS HUGEINT) END AS BIGINT)"

  /** signed BIGINT -> UBIGINT raw bits. */
  def toUnsigned(s: String): String =
    s"CAST(CASE WHEN $s < 0 THEN CAST($s AS HUGEINT) + $U64 ELSE CAST($s AS HUGEINT) END AS UBIGINT)"

  /** Recursive-CTE pair replaying the exact fixed-point log2 lattice
    * (graft.functions.FpMath.log2fp — the 30-step mantissa-squaring
    * recurrence, truncating BIGINT ops only) over the values of
    * `srcSelect`, a SELECT yielding one BIGINT column `v` with v >= 1.
    * Emits two CTE definitions `${name}_r` (the recursion) and `$name`
    * (v, lfp); the enclosing query must open with WITH RECURSIVE. */
  def log2fpCte(name: String, srcSelect: String): String =
    s"""${name}_r AS (
         SELECT v, CAST(length(bin(v)) - 1 AS BIGINT) AS n,
                CASE WHEN length(bin(v)) - 1 <= 30
                     THEN v * (CAST(1 AS BIGINT) << (30 - (length(bin(v)) - 1)))
                     ELSE v // (CAST(1 AS BIGINT) << ((length(bin(v)) - 1) - 30)) END AS m,
                CAST(0 AS BIGINT) AS frac, 0 AS i
         FROM ($srcSelect)
         UNION ALL
         SELECT v, n,
                CASE WHEN ((m * m) >> 30) >= 2147483648
                     THEN (m * m) >> 31 ELSE (m * m) >> 30 END,
                frac * 2 + CASE WHEN ((m * m) >> 30) >= 2147483648 THEN 1 ELSE 0 END,
                i + 1
         FROM ${name}_r WHERE i < 30),
       $name AS (SELECT v, n * 1073741824 + frac AS lfp FROM ${name}_r WHERE i = 30)"""

  /** Lowercased whitespace tokens of `textExpr` (TextAlgos.tokens). */
  def tokensSql(textExpr: String): String =
    s"""list_filter(regexp_split_to_array(lower($textExpr), '\\s+'), x -> len(x) > 0)"""

  /** 64-bit SimHash (TextAlgos.simhash64) of a `toks` token-list column,
    * as UBIGINT (0 for an empty token list). */
  def simhashOfToks(toksExpr: String): String = {
    val hs = s"list_transform($toksExpr, tk -> ${mix64(fnv1a64("tk"))})"
    bind(hs, "hs",
      s"""CASE WHEN len(hs) = 0 THEN CAST(0 AS UBIGINT)
          ELSE CAST(list_sum(list_transform(range(0, 64), b ->
            CASE WHEN 2 * len(list_filter(hs, v -> (v >> b) & 1 = 1)) > len(hs)
                 THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END)) AS UBIGINT)
          END""")
  }

  /** Polynomial window hash mod 2^61-1 folded over the chars of `win`
    * (the direct form of TextAlgos.rollingFingerprint's rolling
    * recurrence — identical values, recomputed per window). */
  private def polyWindow: String =
    s"""CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), list_transform(string_split(win, ''), c -> CAST(ord(c) AS HUGEINT))), (h, c) -> (h * 257 + c) % 2305843009213693951) AS UBIGINT)"""

  /** Rolling min-fingerprint (TextAlgos.rollingFingerprint, window `w`)
    * over a VARCHAR expression, as signed BIGINT. The min is over SIGNED
    * values — Scala compares Longs signed. NULL text yields NULL: the
    * Spark expression is null-intolerant, so the kernel's null branch is
    * unreachable through it. */
  def fingerprintSql(textExpr: String, w: Int): String =
    s"""CASE WHEN $textExpr IS NULL THEN NULL
        WHEN length($textExpr) = 0 THEN 0
        WHEN length($textExpr) <= $w THEN ${toSigned(fnv1a64(textExpr))}
        ELSE list_min(list_transform(range(1, length($textExpr) - ${w - 2}),
          i -> ${bind(s"substring($textExpr, i, $w)", "win", bind(mix64(polyWindow), "wu", toSigned("wu")))}))
        END"""

  /** Word w-shingle hash list (TextAlgos.shingles) of a `toks` token-list
    * column: FNV of space-joined w-grams; single under-length shingle for
    * short docs; empty for empty docs. UBIGINT elements. */
  def shinglesSql(toksExpr: String, w: Int): String =
    bind(toksExpr, "ts",
      s"""CASE WHEN len(ts) = 0 THEN CAST([] AS UBIGINT[])
          WHEN len(ts) < $w THEN [${fnv1a64("array_to_string(ts, ' ')")}]
          ELSE list_transform(range(1, len(ts) - ${w - 2}),
            i -> ${fnv1a64(s"array_to_string(list_slice(ts, i, i + ${w - 1}), ' ')")})
          END""")

  /** MinHash signature (TextAlgos.minhash): k signed minima of
    * mix64(shingle ^ GOLDEN*j) over the shingle list; Long.MaxValue slots
    * for empty docs. Returns BIGINT[] (signed, like the Spark column). */
  def minhashSql(shinglesExpr: String, k: Int): String =
    bind(shinglesExpr, "sh",
      s"""list_transform(range(1, ${k + 1}), j ->
            CASE WHEN len(sh) = 0 THEN 9223372036854775807
            ELSE list_min(list_transform(sh, base ->
              ${bind(mulmod64("CAST(j AS UBIGINT)", "11400714819323198485"), "seedj",
                     bind(mix64("xor(base, seedj)"), "mv", toSigned("mv")))}))
            END)""")

  /** LSH band keys (TextAlgos.lshBands semantics as used by
    * Dedup.bandKeys): FNV-style fold of each band's `rows` signature slots,
    * seeded with offset^bandIdx. Input: BIGINT[] signature; output
    * UBIGINT[] band hashes (bucket identity only — equality semantics match
    * the Spark side's signed longs bit-for-bit). */
  def bandKeysSql(sigExpr: String, bands: Int, rows: Int): String =
    bind(sigExpr, "sig",
      s"""list_transform(range(0, $bands), b ->
            list_reduce(list_prepend(xor(CAST(14695981039346656037 AS UBIGINT), CAST(b AS UBIGINT)),
              list_transform(list_slice(sig, b * $rows + 1, b * $rows + $rows), sv -> ${toUnsigned("sv")})),
              (h, sv) -> ${mulmod64("xor(h, sv)", "1099511628211")}))""")
}
