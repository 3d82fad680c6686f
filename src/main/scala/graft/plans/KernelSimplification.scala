package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions._

/**
 * Optimizer rule for the kernel algebra: a reflexive similarity call —
 * both sides the SAME deterministic, non-nullable expression — is a
 * constant:
 *
 *   fuzz_ratio(x, x)            -> 100
 *   fuzz_partial_ratio(x, x)    -> 100
 *   fuzz_token_set_ratio(x, x)  -> 100   (non-empty token sets; see guard)
 *   fuzz_token_sort_ratio(x, x) -> 100
 *
 * These arise naturally when a generic scoring template is instantiated
 * with the same column on both sides (self-join similarity matrices score
 * their diagonal; feature builders compare a column to itself as a
 * calibration row) — each call then costs an O(|s|) or O(|s|^2) kernel
 * per row for a provably constant answer.
 *
 * Correctness guards:
 *  - the kernels are null-intolerant (NULL in -> NULL out), so every
 *    rewrite requires the shared child to be deterministic AND
 *    non-nullable;
 *  - indel-based `ratio` / `partial_ratio` are total on identical inputs
 *    (rapidfuzz defines ratio("", "") = 100), so they rewrite whenever
 *    the reflexivity guard holds;
 *  - token-based ratios return 0 — not 100 — when the processed token
 *    set is EMPTY (all-separator strings), a data-dependent condition no
 *    static rewrite can decide for an arbitrary column; they rewrite
 *    only for literal children whose token set is provably non-empty.
 */
object KernelSimplification extends Rule[LogicalPlan] {

  private val Hundred: Expression = Literal(100, IntegerType)

  private def reflexive(a: Expression, b: Expression): Boolean =
    a.deterministic && !a.nullable && a.semanticEquals(b)

  /** Token-set/sort ratios are 0 on empty TOKEN sets, so the reflexive
    * rewrite is only safe when the child is a literal whose processed
    * token set is provably non-empty. */
  private def tokensNonEmpty(e: Expression): Boolean = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) if s != null =>
      Fuzz.tokenSetRatio(s.toString, s.toString) == 100
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case FuzzRatio(a, b) if reflexive(a, b) => Hundred
      case FuzzPartialRatio(a, b) if reflexive(a, b) => Hundred
      case FuzzTokenSetRatio(a, b) if reflexive(a, b) && tokensNonEmpty(a) => Hundred
      case FuzzTokenSortRatio(a, b) if reflexive(a, b) && tokensNonEmpty(a) => Hundred
    }
}
