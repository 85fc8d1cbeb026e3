package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite `levenshtein(a, b) <= k` filter predicates to
  * the BANDED form `levenshtein(a, b, k) >= 0`.
  *
  * Spark's 3-arg Levenshtein runs the Ukkonen-banded DP — O(k·n) instead
  * of the full O(n·m) table — and short-circuits to -1 when
  * `abs(len(a) - len(b)) > k` without touching the DP at all. For a
  * threshold predicate the full distance is wasted work: only
  * "within k or not" is consumed. On a near-dup verifier (x47's shape)
  * with k ≪ len, the band is the difference between comparing prefixes
  * in O(k·n) and O(n²) per pair.
  *
  * Equivalence: for k ≥ 0, `lev(a,b) ≤ k  ⟺  levₖ(a,b) ≥ 0` — the banded
  * form returns the exact distance when ≤ k and -1 otherwise; NULL inputs
  * propagate NULL through both forms identically. `lev < k` rewrites with
  * band k-1. Only literal non-negative thresholds rewrite; the rewritten
  * tree contains a Levenshtein WITH a threshold, which the matcher
  * excludes — the rule is idempotent and fixpoint-safe.
  *
  * Installed by [[GraftExtensions]] via `injectOptimizerRule` (the
  * deployment path) and exercised in tests through
  * `spark.experimental.extraOptimizations`.
  */
object LevenshteinThresholdRewrite extends Rule[LogicalPlan] {

  /** The comparison's value side: a thresholdless levenshtein, bare or
    * under the long cast a DSL `.cast("long")` adds. Returns the builder
    * that re-wraps the banded expression the same way. */
  private object Lev {
    def unapply(e: Expression): Option[(Levenshtein, Expression => Expression)] =
      e match {
        case l: Levenshtein if l.threshold.isEmpty =>
          Some((l, identity))
        case c @ Cast(l: Levenshtein, LongType, _, _) if l.threshold.isEmpty =>
          Some((l, banded => c.copy(child = banded)))
        case _ => None
      }
  }

  private def intVal(lit: Literal): Option[Int] = lit match {
    case Literal(v: Int, IntegerType) => Some(v)
    case Literal(v: Long, LongType) if v >= Int.MinValue && v <= Int.MaxValue =>
      Some(v.toInt)
    case _ => None
  }

  /** `levₖ(a,b) ≥ 0`, with the banded call re-wrapped (cast) like the
    * original so comparison types are unchanged. */
  private def bandedGe0(l: Levenshtein, wrap: Expression => Expression,
      k: Int, zero: Literal): Expression =
    GreaterThanOrEqual(
      wrap(Levenshtein(l.left, l.right, Some(Literal(k)))), zero)

  private def rewrite(cond: Expression): Expression = cond transformUp {
    case e @ LessThanOrEqual(Lev(l, wrap), lit: Literal) =>
      intVal(lit).filter(_ >= 0)
        .fold(e: Expression)(k => bandedGe0(l, wrap, k, zeroLike(lit)))
    case e @ LessThan(Lev(l, wrap), lit: Literal) =>
      intVal(lit).filter(_ >= 1)
        .fold(e: Expression)(k => bandedGe0(l, wrap, k - 1, zeroLike(lit)))
    case e @ GreaterThanOrEqual(lit: Literal, Lev(l, wrap)) =>
      intVal(lit).filter(_ >= 0)
        .fold(e: Expression)(k => bandedGe0(l, wrap, k, zeroLike(lit)))
    case e @ GreaterThan(lit: Literal, Lev(l, wrap)) =>
      intVal(lit).filter(_ >= 1)
        .fold(e: Expression)(k => bandedGe0(l, wrap, k - 1, zeroLike(lit)))
  }

  private def zeroLike(lit: Literal): Literal = lit.dataType match {
    case LongType => Literal(0L)
    case _ => Literal(0)
  }

  // Filter AND Join conditions: by the time user-provided rules run,
  // predicate pushdown has usually folded the threshold predicate into a
  // join condition (x47's blocked self-join does exactly this).
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      val next = rewrite(cond)
      if (next fastEquals cond) f else f.copy(condition = next)
    case j @ Join(_, _, _, Some(cond), _) =>
      val next = rewrite(cond)
      if (next fastEquals cond) j else j.copy(condition = Some(next))
  }
}
