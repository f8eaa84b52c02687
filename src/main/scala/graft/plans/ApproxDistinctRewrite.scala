package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `count(DISTINCT x)` to the
  * HyperLogLog++ sketch (`approx_count_distinct`) — the 100 TB
  * cardinality swap this engine documents everywhere (profile ndv,
  * distinct verdicts, privacy audit), applied as a CATALYST REWRITE
  * so an unchanged query corpus flips to sketch cardinalities with
  * one session flag instead of a code migration.
  *
  * Strictly OPT-IN (`spark.graft.approx.countDistinct=true`; error
  * band via `spark.graft.approx.countDistinct.rsd`, default 0.05):
  * the rewrite changes results by design — ±rsd relative error on
  * the distinct counts — which is exactly the trade a 100 TB
  * dashboard wants and an oracle-verified correctness run must not
  * make, so the default leaves every plan byte-identical.
  *
  * Scope guards: only single-argument, deterministic
  * `count(DISTINCT x)` rewrites (multi-column distinct and
  * count(*) stay exact); FILTER clauses and the aggregate's
  * `resultId` are preserved, so downstream references bind
  * unchanged and the output stays LongType.
  *
  * Scale: exact distinct plans through Expand — one extra shuffle
  * of the full (group, x) stream per distinct column; the sketch is
  * fixed-size per group and map-side mergeable, turning the worst
  * aggregate shape in the engine into a plain one-pass aggregate. */
class ApproxDistinctRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.approx.countDistinct", "false")
        .toBoolean) plan
    else {
      val rsd = conf
        .getConfString("spark.graft.approx.countDistinct.rsd", "0.05")
        .toDouble
      plan.transform {
        case a: Aggregate => a.transformExpressionsDown {
          case AggregateExpression(c: Count, mode, true, filter,
              resultId)
              if c.children.size == 1 && c.children.head.deterministic =>
            AggregateExpression(
              HyperLogLogPlusPlus(c.children.head, rsd),
              mode, isDistinct = false, filter, resultId)
        }
      }
    }
  }
}
