package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `percentile(x, p)` aggregates
  * to `approx_percentile(x, p, accuracy)` — the OTHER documented
  * 100 TB swap family (llm_len_quantiles, the stratified quantile
  * gates), applied as a CATALYST REWRITE like
  * [[ApproxDistinctRewrite]], so an unchanged query corpus flips to
  * sketched quantiles with one session flag instead of a per-operator
  * code migration.
  *
  * Strictly OPT-IN (`spark.graft.approx.percentile=true`; sketch
  * accuracy via `spark.graft.approx.percentile.accuracy`, default
  * 10000 ≈ ±0.01% rank error): the rewrite changes results by design
  * (a rank-bounded observed value instead of the interpolated exact
  * quantile), so the default leaves every plan byte-identical.
  *
  * Scope guards: only the plain deterministic form rewrites —
  * `percentile(DISTINCT …)`, the weighted `percentile(x, p, freq)`
  * form, and `percentile_disc`'s reverse variant have no approx
  * counterpart and stay exact. FILTER clauses and the aggregate's
  * `resultId` are preserved. `approx_percentile` returns the INPUT
  * type where exact percentile interpolates in double, so the swap
  * is wrapped in a cast back to the original result type — parent
  * operators (already resolved against the exact type) bind
  * unchanged.
  *
  * Scale: exact percentile buffers EVERY value per group (an
  * OpenHashMap of value→count — group-cardinality memory, the
  * classic 100 TB OOM); the GK-quantile sketch is fixed-size per
  * group (O(accuracy·log n)) and map-side mergeable, so the same
  * query becomes a bounded-memory one-pass aggregate. */
class ApproxPercentileRewrite extends Rule[LogicalPlan] {

  private def unitFrequency(p: Percentile): Boolean =
    p.frequencyExpression match {
      case Literal(1L, _) => true
      case _              => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.approx.percentile", "false")
        .toBoolean) plan
    else {
      val accuracy = conf
        .getConfString("spark.graft.approx.percentile.accuracy", "10000")
        .toInt
      plan.transform {
        case a: Aggregate => a.transformExpressionsDown {
          case ae @ AggregateExpression(p: Percentile, mode, false,
              filter, resultId)
              if unitFrequency(p) && !p.reverse &&
                p.children.forall(_.deterministic) =>
            val swapped = AggregateExpression(
              ApproximatePercentile(p.child, p.percentageExpression,
                Literal(accuracy), 0, 0),
              mode, isDistinct = false, filter, resultId)
            if (swapped.dataType == ae.dataType) swapped
            else Cast(swapped, ae.dataType)
        }
      }
    }
  }
}
