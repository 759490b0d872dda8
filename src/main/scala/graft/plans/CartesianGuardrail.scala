package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** GOVERNANCE GUARDRAIL (§2.11 tier c, the policy variant): an optimizer
  * rule that FAILS a query which would plan an unconditioned inner/cross
  * join — at 100 TB an accidental cartesian product is a cluster outage,
  * not a slow query, and the right failure mode is analysis-time rejection
  * with an override knob, not an OOM three hours in.
  *
  * Opt-outs, in order of intent:
  *  - `spark.conf.set("spark.graft.allowCartesian", "true")` — session-wide
  *    (ETL jobs that legitimately build small grids, e.g. q18's operator);
  *  - an explicit `crossJoin(broadcast(df))` where the build side is a
  *    sub-`maxRows` aggregate — the scalar-broadcast pattern the catalog
  *    uses everywhere — passes automatically: a provably-bounded side is
  *    not an accident.
  *
  * The rule is NOT installed by the engine's own sessions (the catalog
  * contains deliberate cross joins); it ships for `spark.sql.extensions`
  * deployment on multi-tenant clusters, and GuardrailSpec exercises it on
  * a dedicated session. */
object CartesianGuardrail extends Rule[LogicalPlan] {

  private val FlagKey = "spark.graft.allowCartesian"

  /** A join side is "bounded" when Catalyst can prove a small max row
    * count — aggregates without grouping keys (1 row), limits, tiny
    * local relations. Bounded sides make a cross join a broadcast of a
    * scalar/census, the legitimate pattern. */
  private def bounded(p: LogicalPlan): Boolean =
    p.maxRows.exists(_ <= 1000L)

  /** A condition is "effectively unconditioned" when it is absent, a
    * literal truth (ON true / ON 1=1 folds to Literal(true) by this
    * point in the optimizer), or references at most one side — any of
    * which still plans a cartesian/BNLJ pair blowup. */
  private def unconditioned(cond: Option[Expression],
      left: LogicalPlan, right: LogicalPlan): Boolean = cond match {
    case None => true
    case Some(Literal(true, _)) => true
    case Some(e) =>
      val refs = e.references
      !(refs.intersect(left.outputSet).nonEmpty &&
        refs.intersect(right.outputSet).nonEmpty)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val allowed = conf.getConfString(FlagKey, "false").toBoolean
    if (!allowed) {
      plan.foreach {
        case Join(left, right, Inner | Cross, cond, _)
            if unconditioned(cond, left, right) &&
              !bounded(left) && !bounded(right) =>
          throw new SparkException(
            s"cartesian product between unbounded relations blocked by " +
              s"graft guardrail; set $FlagKey=true to override")
        case _ => ()
      }
    }
    plan
  }
}

/** Extensions entry point installing ONLY the guardrail — for clusters
  * that want the policy without the rewrite rules:
  * `--conf spark.sql.extensions=graft.plans.GuardrailExtensions`. */
class GuardrailExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(extensions: org.apache.spark.sql.SparkSessionExtensions): Unit =
    extensions.injectOptimizerRule(_ => CartesianGuardrail)
}
