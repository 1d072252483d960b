package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import graft.functions.{CharBagExpression, CharBagWithinExpression}

/** Optimizer rule: auto-inject the packed char-bag prune ahead of raw
  * `levenshtein(a, b) <= k` predicates — the extension ladder's
  * `Rule[LogicalPlan]` tier, registered via
  * [[graft.functions.GraftExtensions]] (`injectOptimizerRule`).
  *
  * Why: the Scala API's banded edit-distance join
  * ([[graft.operators.DedupSpans.editDistancePairs]]) applies the
  * CharBag L1 reject by hand, but a SQL user writing
  * `WHERE levenshtein(a.text, b.text) <= 2` on a join gets the raw
  * O(n·m) DP per candidate. This rule rewrites each such conjunct to
  * `char_bag_within(char_bag(a), char_bag(b), k) AND levenshtein(...)`,
  * so the one-static-call histogram reject runs first and the DP only
  * prices survivors (2.56% of banded candidates on the saturated ×100
  * twin — BENCH_sf10_r14.json bag_prune row). EXACT: `levenshtein <= k`
  * implies both bag bounds (letter L1 ≤ 2k, hashed-bigram L1 ≤ 4k —
  * scaladoc/spec of [[CharBagWithinExpression]]), so the added conjunct
  * can never drop a qualifying row.
  *
  * Safety gates, each load-bearing:
  *  - only `Levenshtein` WITHOUT a user threshold argument — Spark's
  *    3-arg form returns -1 when the distance exceeds the threshold,
  *    so `lev(a, b, t) <= k` can be TRUE for pairs the bag bound
  *    rejects; rewriting it would change results.
  *  - only deterministic comparisons with a foldable non-negative
  *    integer bound (k < 0 rows can never qualify; leave the
  *    always-false predicate to constant folding).
  *  - idempotent under the fixed-point optimizer batch: a condition
  *    already carrying a [[CharBagWithinExpression]] is left alone.
  */
object LevenshteinPruneRule extends Rule[LogicalPlan] {

  /** Extract (left, right, inclusive bound) from a supported
    * levenshtein comparison conjunct. */
  private def levBound(e: Expression): Option[(Expression, Expression, Int)] = {
    def lit(x: Expression): Option[Int] = x match {
      case Literal(k: Int, IntegerType) => Some(k)
      case _ => None
    }
    def lev(x: Expression): Option[Levenshtein] = x match {
      case l: Levenshtein if l.threshold.isEmpty => Some(l)
      case _ => None
    }
    val out = e match {
      case LessThanOrEqual(l, r) =>
        lev(l).flatMap(lv => lit(r).map(k => (lv.left, lv.right, k)))
      case LessThan(l, r) =>
        lev(l).flatMap(lv => lit(r).map(k => (lv.left, lv.right, k - 1)))
      case GreaterThanOrEqual(l, r) =>
        lev(r).flatMap(lv => lit(l).map(k => (lv.left, lv.right, k)))
      case GreaterThan(l, r) =>
        lev(r).flatMap(lv => lit(l).map(k => (lv.left, lv.right, k - 1)))
      case _ => None
    }
    out.filter { case (a, b, k) =>
      k >= 0 && k <= 0xFFFF && e.deterministic &&
        a.dataType == org.apache.spark.sql.types.StringType &&
        b.dataType == org.apache.spark.sql.types.StringType
    }
  }

  private def eligible(cond: Expression): Boolean =
    !cond.exists(_.isInstanceOf[CharBagWithinExpression]) &&
      cond.exists(c => levBound(c).isDefined)

  private def addPrune(cond: Expression): Expression =
    cond.transformUp {
      case cmp if levBound(cmp).isDefined =>
        val (a, b, k) = levBound(cmp).get
        And(CharBagWithinExpression(
          CharBagExpression(a), CharBagExpression(b), k), cmp)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) if eligible(cond) =>
      f.copy(condition = addPrune(cond))
    case j @ Join(_, _, _, Some(cond), _) if eligible(cond) =>
      j.copy(condition = Some(addPrune(cond)))
  }
}
