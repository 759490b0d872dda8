package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** SURVEY.md §2.11/§4 — an OPT-IN approximation rewrite (the BlinkDB/
  * "approximate query processing" knob, expressed as a Catalyst rule):
  * when `spark.graft.approxDistinct.enabled=true`, every single-column
  * `COUNT(DISTINCT x)` in an Aggregate is rewritten to the mergeable
  * HyperLogLog++ sketch aggregate (`approx_count_distinct`, rsd 5%).
  *
  * Why a rule and not "just write approx_count_distinct": the flag makes
  * the SAME query text/dashboard definition run exact on small tiers and
  * sketched at the 100 TB tier, where an exact distinct is a full shuffle
  * of every distinct value but the HLL++ sketch is a few KB per partition
  * merged map-side (the q29/q133 scale story, applied transparently).
  * The rewrite preserves the aggregate's output attribute (same exprId,
  * same LongType), so downstream operators and result schemas are
  * untouched; GROUP-BY keys, other aggregates, and FILTER clauses pass
  * through unchanged. Multi-argument COUNT(DISTINCT a, b) is left alone
  * (no sketch equivalent with the same null semantics).
  *
  * Activation: [[GraftExtensions]] (`spark.sql.extensions`) is the
  * RECOMMENDED path — its rules run inside the main optimizer batches,
  * before `RewriteDistinctAggregates` expands anything, so every
  * single-column COUNT(DISTINCT x) is caught. The runtime fallback
  * (`spark.experimental.extraOptimizations`, the spec path) runs AFTER
  * Spark's own batches: an Aggregate holding TWO OR MORE distinct
  * aggregates has already been expanded into the Expand/double-Aggregate
  * shape by then and is deliberately NOT rewritten on that path — only
  * aggregates with a single distinct survive expansion un-rewritten and
  * get sketched. Flag-off is the default — the rule is a no-op unless the
  * session explicitly opts in (ApproxRewriteSpec proves plan identity in
  * that case, and a ≤5%-of-exact estimate + sketched-plan shape when on). */
object RewriteApproxDistinct extends Rule[LogicalPlan] {

  val FlagKey = "spark.graft.approxDistinct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(FlagKey, "false").toBoolean) return plan
    plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _) =>
            ae.copy(aggregateFunction = HyperLogLogPlusPlus(child),
              isDistinct = false)
        }
    }
  }
}
