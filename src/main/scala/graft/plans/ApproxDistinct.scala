package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Coalesce, Expression, HllSketchEstimate, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, HllSketchAgg}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

/** Opt-in approximate-query acceleration: rewrite `COUNT(DISTINCT x)` to a
  * datasketches HLL estimate (`hll_sketch_estimate(hll_sketch_agg(x))`).
  *
  * Why this is THE scale lever for distinct counts: exact distinct
  * aggregation shuffles every distinct value (Spark plans a two-phase
  * Expand + double shuffle for mixed distinct/non-distinct aggregates),
  * while the sketch is a fixed-size (~KB) mergeable summary — partials
  * combine map-side like any algebraic aggregate, the shuffle carries
  * sketches instead of values, and accuracy is a bounded ~1.6%/sqrt(2^lgK)
  * relative error. Same trade the engine's per-day sketch rollups make at
  * rest (Engine.sketchRollup), applied to ad-hoc queries.
  *
  * APPROXIMATE results by definition — so strictly opt-in via
  * `spark.graft.approxCountDistinct=true`, scoped to the session that set
  * it, and only for single-argument COUNT(DISTINCT) over types the sketch
  * hashes (int/long/string/binary); everything else is left exact.
  * Grouped aggregates rewrite too (the estimate is per group).
  *
  * The estimate is wrapped `coalesce(..., 0L)`: COUNT(DISTINCT) is 0 (and
  * non-null) on empty input or all-null groups, while
  * hll_sketch_estimate(hll_union of nothing) is NULL — without the wrap
  * the rewrite would change semantics beyond approximation AND substitute
  * a nullable expression for a non-nullable attribute post-analysis
  * (round-5 ADVICE).
  */
object ApproxCountDistinctRule extends Rule[LogicalPlan] {

  val EnabledConf = "spark.graft.approxCountDistinct"

  private def sketchable(e: Expression): Boolean = e.dataType match {
    case IntegerType | LongType | StringType | BinaryType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledConf, "false").toBoolean) plan
    else plan.transformUp {
      case a: Aggregate =>
        a.transformExpressions {
          case AggregateExpression(Count(Seq(child)), _, true, None, _)
              if sketchable(child) =>
            Coalesce(Seq(
              HllSketchEstimate(AggregateExpression(
                HllSketchAgg(child, Literal(12)), Complete,
                isDistinct = false)),
              Literal(0L)))
        }
    }
}
