package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, Length, LessThanOrEqual, Levenshtein, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: in front of a thresholded edit-distance filter
  * `levenshtein(a, b) <= k`, inject the free lower-bound guard
  * `abs(length(a) - length(b)) <= k`.
  *
  * `levenshtein(a,b) >= |len(a) - len(b)|` always, so the guard rejects
  * exactly the rows the DP would reject — results are unchanged — but it
  * costs two length reads instead of an O(len·k) banded DP, and placed as
  * the FIRST conjunct it short-circuits the expensive predicate for every
  * length-mismatched pair. This is the prefilter fuzzy-match pipelines
  * write by hand (q83 does); the rule gives it to every thresholded
  * levenshtein filter in the session — including plain-SQL queries through
  * QueryClient — for free.
  *
  * Idempotent under the optimizer's fixed-point batches: a filter whose
  * condition already contains a semantically-equal guard is left alone.
  * Null semantics are unaffected (the guard is null exactly when the
  * distance is null, and Filter drops both).
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def guard(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      // transformUp, not transform: a top-down pass would descend into
      // the freshly-built And(guard, le) replacement, match `le` again,
      // and expand forever inside a single rule application
      val rewritten = cond transformUp {
        case le @ LessThanOrEqual(Levenshtein(a, b, _), k: Literal)
            if !cond.exists(_.semanticEquals(guard(a, b, k))) =>
          And(guard(a, b, k), le)
      }
      if (rewritten.fastEquals(cond)) f else Filter(rewritten, child)
  }
}
