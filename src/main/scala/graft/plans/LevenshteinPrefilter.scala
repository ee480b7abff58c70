package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, GreaterThan, GreaterThanOrEqual, Length, LessThan, LessThanOrEqual, Levenshtein, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: in front of a thresholded edit-distance filter
  * (`levenshtein(a, b) <= k`, `< k`, or the commuted `k >= / > ...`),
  * inject the free lower-bound guard `abs(length(a) - length(b)) <= k`
  * (strict when the comparison is strict).
  *
  * `levenshtein(a,b) >= |len(a) - len(b)|` always, so the guard rejects
  * exactly the rows the DP would reject — results are unchanged — but it
  * costs two length reads instead of an O(len·k) banded DP, and placed as
  * the FIRST conjunct it short-circuits the expensive predicate for every
  * length-mismatched pair. This is the prefilter fuzzy-match pipelines
  * write by hand (q83 does); the rule gives it to every two-arg
  * thresholded levenshtein filter in the session — plain-SQL queries
  * through QueryClient included — for free.
  *
  * Deliberately NOT rewritten:
  *   - the three-arg `levenshtein(a, b, t)` form — it returns -1 when the
  *     distance exceeds t, and `-1 <= k` is TRUE, so a length guard would
  *     DROP rows the original filter keeps (q83 relies on exactly that -1
  *     convention);
  *   - non-deterministic operands — the guard re-evaluates `a`/`b`, which
  *     must not observe different values than the distance call.
  *
  * Idempotent under the optimizer's fixed-point batches: a filter whose
  * condition already contains a semantically-equal guard is left alone.
  * Null semantics are unaffected (the guard is null exactly when the
  * distance is null, and Filter drops both).
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def guard(a: Expression, b: Expression, k: Expression,
                    strict: Boolean): Expression = {
    val diff = Abs(Subtract(Length(a), Length(b)))
    if (strict) LessThan(diff, k) else LessThanOrEqual(diff, k)
  }

  private def rewritable(a: Expression, b: Expression): Boolean =
    a.deterministic && b.deterministic

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      def fresh(g: Expression): Boolean =
        !cond.exists(_.semanticEquals(g))
      // transformUp, not transform: a top-down pass would descend into
      // the freshly-built And(guard, original) replacement, match the
      // original again, and expand forever inside a single application
      val rewritten = cond transformUp {
        case le @ LessThanOrEqual(Levenshtein(a, b, None), k: Literal)
            if rewritable(a, b) && fresh(guard(a, b, k, strict = false)) =>
          And(guard(a, b, k, strict = false), le)
        case lt @ LessThan(Levenshtein(a, b, None), k: Literal)
            if rewritable(a, b) && fresh(guard(a, b, k, strict = true)) =>
          And(guard(a, b, k, strict = true), lt)
        case ge @ GreaterThanOrEqual(k: Literal, Levenshtein(a, b, None))
            if rewritable(a, b) && fresh(guard(a, b, k, strict = false)) =>
          And(guard(a, b, k, strict = false), ge)
        case gt @ GreaterThan(k: Literal, Levenshtein(a, b, None))
            if rewritable(a, b) && fresh(guard(a, b, k, strict = true)) =>
          And(guard(a, b, k, strict = true), gt)
      }
      if (rewritten.fastEquals(cond)) f else Filter(rewritten, child)
  }
}
