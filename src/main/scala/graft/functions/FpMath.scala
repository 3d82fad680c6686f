package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/**
 * Exact fixed-point math shared by the data-selection operators
 * ([[graft.operators.Dsir]]) and their column kernels — the engine-wide
 * "exact integers, no libm" determinism contract applied to logarithms.
 */
object FpMath {

  /** Fractional bits of the fixed-point log2 lattice. 30 keeps every
    * intermediate (m*m < 2^62) inside a signed 64-bit integer. */
  val FracBits: Int = 30
  val One: Long = 1L << FracBits

  /**
   * Exact floor-ish 2^30-lattice log2 of x >= 1 by mantissa squaring:
   * write x = 2^n * v with v in [1, 2) held as a 2.30 fixed-point
   * integer m; each squaring step emits one fractional bit of log2 v
   * (v^2 >= 2 -> bit 1, renormalize). Truncating integer ops throughout,
   * so any engine replaying the recurrence (the DuckDB oracle runs it as
   * a 30-step recursive CTE) lands on the identical lattice point
   * regardless of platform libm.
   */
  def log2fp(x: Long): Long = {
    require(x >= 1, s"log2fp domain is x >= 1, got $x")
    val n = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m: Long = if (n <= FracBits) x << (FracBits - n) else x >> (n - FracBits)
    var frac = 0L
    var i = 0
    while (i < FracBits) {
      val sq = (m * m) >> FracBits
      if (sq >= (One << 1)) { m = sq >> 1; frac = (frac << 1) | 1L }
      else { m = sq; frac = frac << 1 }
      i += 1
    }
    (n.toLong << FracBits) + frac
  }

  /** Sum of per-bucket lattice LLR terms over a document's feature
    * buckets — the row-local DSIR score. Called from generated code
    * (static forwarder); `llr` is the dense `buckets`-sized table. */
  def dsirScore(bs: Array[Int], llr: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < bs.length) { s += llr(bs(i)); i += 1 }
    s
  }
}

/** Column form of [[FpMath.log2fp]] — null-intolerant, codegen'd as one
  * static call. Input must be >= 1 (the callers derive it from hash bits
  * with an explicit floor). */
case class Log2Fp(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any): Any = FpMath.log2fp(x.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FpMath.log2fp($c)")
  override def prettyName: String = "log2fp"
  override protected def withNewChildInternal(nc: Expression): Expression = copy(nc)
}

/** Column form of [[TextAlgos.mix64]] (the murmur3 finalizer) — the
  * engine-wide hash mixer, exposed for hash-derived uniform fractions
  * (Gumbel keys, salt derivations). */
case class Mix64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any): Any = TextAlgos.mix64(x.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextAlgos.mix64($c)")
  override def prettyName: String = "mix64"
  override protected def withNewChildInternal(nc: Expression): Expression = copy(nc)
}

/** Row-local DSIR scoring against a DRIVER-HELD dense LLR table (the
  * trained importance model, ≤ `buckets` longs): the table rides into
  * every task as a codegen reference object (the PqEncode pattern), so
  * per-document scoring is one array pass in the scan projection — no
  * (id, bucket) explode, no census join, no shuffle. This is both the
  * batch scoring plan after the one census pass and the entire per-batch
  * work of streaming DSIR serving. */
case class DsirScore(child: Expression, llr: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    FpMath.dsirScore(v.asInstanceOf[ArrayData].toIntArray(), llr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("dsirLlr", llr, "long[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.FpMath.dsirScore($v.toIntArray(), $t);""")
  }
  override def prettyName: String = "dsir_score"
  override protected def withNewChildInternal(nc: Expression): Expression = copy(child = nc)
}
