package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

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
