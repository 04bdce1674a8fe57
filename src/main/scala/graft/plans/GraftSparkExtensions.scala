package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.tsdb.Engine

/** Session extensions injecting the segment-native aggregate rewrite into
  * Catalyst itself — the full-fidelity form of the reference's
  * `ModelSimpleAggregates` physical optimizer rule
  * (/root/reference/crates/modelardb_storage/src/optimizer/model_simple_aggregates.rs:175-334):
  * with this installed, ANY `spark.sql(...)` over a registered time series
  * view gets simple aggregates answered from segment metadata, without
  * going through `Engine.sql`.
  *
  * Install at session build time:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
  *     // or .withExtensions(new GraftSparkExtensions)
  * }}}
  * Engines announce themselves on `registerViews()`; the rule is a no-op
  * until a registered view exists for the session.
  *
  * The rule runs post-hoc during analysis (not in the optimizer): at that
  * point a referenced temp view is still the verbatim registered plan, so
  * the `sameResult` spoof-guard comparison holds before column pruning and
  * projection collapsing rewrite the subtree.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectPostHocResolutionRule(session =>
      new SegmentAggregateRule(session))
}

object GraftSparkExtensions {
  private val engines =
    new java.util.WeakHashMap[SparkSession, List[Engine]]()

  /** Called by Engine.registerViews: make the engine's views visible to the
    * session's rewrite rule.
    */
  private[graft] def noteEngine(spark: SparkSession, engine: Engine): Unit =
    engines.synchronized {
      val current = Option(engines.get(spark)).getOrElse(Nil)
      if (!current.exists(_ eq engine))
        engines.put(spark, engine :: current)
    }

  private[plans] def enginesFor(spark: SparkSession): List[Engine] =
    engines.synchronized { Option(engines.get(spark)).getOrElse(Nil) }
}

/** Rewrites `Aggregate(tag-groupings, simple-aggs, <registered tst view>)`
  * into the segment-native aggregate, preserving the original output
  * attributes (names, exprIds, types) so parent operators are untouched.
  */
class SegmentAggregateRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val engines = GraftSparkExtensions.enginesFor(session)
    if (engines.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => rewrite(engines, agg).getOrElse(agg)
    }
  }

  private def rewrite(engines: List[Engine], agg: Aggregate): Option[LogicalPlan] =
    engines.iterator
      .flatMap(SegmentAggregateSqlRewrite.spliceRewrite(_, agg))
      .nextOption()
}
