package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, TimestampType}

/** Session extensions carrying the library's Catalyst additions — the
  * extension-ladder rung (c) of the builder contract: whole-plan rewrites
  * that the DataFrame surface cannot express. Register with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => BinnedRangeJoinRule)
    e.injectOptimizerRule(_ => ApproxCountDistinctRule)
  }
}

/** Rewrite pure interval joins (`l.x BETWEEN r.lo AND r.hi` with NO equi
  * key) into binned equi-joins — the overlap-binning trick behind every
  * production range-join implementation (Databricks' RANGE_JOIN hint,
  * GeoSpark's grid partitioning).
  *
  * Why: without an equality conjunct, Spark can only plan a broadcast
  * nested loop or a cartesian product — the two shapes that die first at
  * scale (PlanShapeSpec forbids them for exactly that reason). With a bin
  * width `w`, the point side computes `floor(x/w)` (one extra column) and
  * the interval side explodes the bins its `[lo, hi]` span overlaps; the
  * join becomes a plain shuffled equi-join on the bin plus the original
  * predicate as a post-filter. Results are identical: every (point,
  * interval) match shares the point's bin, which the interval spans; bins
  * outside the span produce no equi-match, and the re-applied original
  * condition removes same-bin non-overlaps.
  *
  * Cost model: interval rows fan out by `ceil(span/w) + 1` — pick `w` on
  * the order of the typical interval span (fan-out ~2) via
  * `spark.graft.rangeJoin.binSize`. The rule is OPT-IN by that conf: when
  * unset, plans are untouched (a small broadcastable side is often better
  * served by the nested loop Spark picks natively).
  *
  * Scope guards: inner joins, deterministic conditions, numeric/timestamp
  * point types, and no equality conjunct across the sides (after the
  * rewrite the new bin equality makes the guard false, so the rule cannot
  * re-fire on its own output).
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeConf = "spark.graft.rangeJoin.binSize"

  private def binnable(e: Expression): Boolean = e.dataType match {
    case _: NumericType | TimestampType => true
    case _ => false
  }

  /** floor(x / w) as a LongType bin id (timestamps cast through seconds). */
  private def bin(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(BinSizeConf, "")
    // a malformed/nonpositive bin size must not fail UNRELATED queries in
    // the session (this rule runs on every plan): warn and stand down
    val parsed = scala.util.Try(w.toDouble).toOption.filter(_ > 0)
    if (w.nonEmpty && parsed.isEmpty)
      logWarning(s"ignoring invalid $BinSizeConf='$w' (want a positive number)")
    if (parsed.isEmpty) plan
    else {
      val width = parsed.get
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint)
            if cond.deterministic =>
          val conj = splitConjunctivePredicates(cond)
          def leftOnly(e: Expression) =
            e.references.nonEmpty && e.references.subsetOf(left.outputSet)
          def rightOnly(e: Expression) =
            e.references.nonEmpty && e.references.subsetOf(right.outputSet)
          def crossSides(a: Expression, b: Expression) =
            (leftOnly(a) && rightOnly(b)) || (rightOnly(a) && leftOnly(b))
          val hasEqui = conj.exists {
            case EqualTo(a, b) => crossSides(a, b)
            case EqualNullSafe(a, b) => crossSides(a, b)
            case _ => false
          }
          // (point, bound) pairs with point and bound on opposite sides
          val lowers = conj.collect {
            case GreaterThanOrEqual(p, b) if crossSides(p, b) => (p, b)
            case GreaterThan(p, b) if crossSides(p, b) => (p, b)
            case LessThanOrEqual(b, p) if crossSides(p, b) => (p, b)
            case LessThan(b, p) if crossSides(p, b) => (p, b)
          }
          val uppers = conj.collect {
            case LessThanOrEqual(p, b) if crossSides(p, b) => (p, b)
            case LessThan(p, b) if crossSides(p, b) => (p, b)
            case GreaterThanOrEqual(b, p) if crossSides(p, b) => (p, b)
            case GreaterThan(b, p) if crossSides(p, b) => (p, b)
          }
          val triple = if (hasEqui) None
          else lowers.flatMap { case (p, lo) =>
            uppers.collectFirst {
              case (p2, hi) if p.semanticEquals(p2) &&
                binnable(p) && binnable(lo) && binnable(hi) &&
                // lo and hi must live on the same (interval) side
                leftOnly(lo) == leftOnly(hi) => (p, lo, hi)
            }
          }.headOption
          triple match {
            case None => j
            case Some((point, lo, hi)) =>
              val pointIsLeft = leftOnly(point)
              val (pointPlan, boundPlan) =
                if (pointIsLeft) (left, right) else (right, left)
              val binPoint = Alias(bin(point, width), "__graft_bin")()
              val pointProj =
                Project(pointPlan.output :+ binPoint, pointPlan)
              val binAttr =
                AttributeReference("__graft_bin_span", LongType)()
              // Greatest guards inverted (empty) intervals: they emit one
              // bin instead of crashing Sequence; the re-applied original
              // condition filters them out
              // Sequence is TimeZoneAwareExpression: post-analysis rules
              // must fill timeZoneId themselves or the plan goes back to
              // unresolved (the analyzer's ResolveTimeZone has already run)
              val span = Sequence(bin(lo, width),
                Greatest(Seq(bin(hi, width), bin(lo, width))),
                Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
              val gen = Generate(Explode(span), Nil, outer = false, None,
                Seq(binAttr), boundPlan)
              val eq = EqualTo(binPoint.toAttribute, binAttr)
              val newJoin =
                if (pointIsLeft)
                  Join(pointProj, gen, Inner, Some(And(eq, cond)), hint)
                else
                  Join(gen, pointProj, Inner, Some(And(eq, cond)), hint)
              Project(j.output, newJoin)
          }
      }
    }
  }
}
