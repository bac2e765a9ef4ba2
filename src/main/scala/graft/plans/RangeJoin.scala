package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, TimestampType}

/** Session extensions carrying the library's Catalyst additions — the
  * extension-ladder rung (c) of the builder contract: whole-plan rewrites
  * that the DataFrame surface cannot express. Register with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // the rule is bound to the session it was injected into — width
    // sampling must run on the session compiling the plan, not whatever
    // SparkSession.active happens to be in a multi-session app
    e.injectOptimizerRule(s => new BinnedRangeJoinRule(Some(s)))
    e.injectOptimizerRule(_ => ApproxCountDistinctRule)
    // the custom generator is part of the extension surface too, so a
    // session built with GraftExtensions can SELECT explode_line(...)
    // without going through an Engine (which registers it per-session)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("explode_line"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.ExplodeLine].getName, "explode_line"),
      graft.functions.ExplodeLine.fromArgs))
  }
}

/** Rewrite interval joins (`l.x BETWEEN r.lo AND r.hi`) into binned
  * equi-joins — the overlap-binning trick behind every production
  * range-join implementation (Databricks' RANGE_JOIN hint, GeoSpark's grid
  * partitioning).
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
  * Bin width: interval rows fan out by `ceil(span/w) + 1`, so the right
  * `w` is on the order of the typical interval span (fan-out ~2).
  *  - `spark.graft.rangeJoin.binSize` pins it explicitly;
  *  - when unset, the rule SAMPLES it: one approx-percentile aggregate
  *    over the interval side at rewrite time (p50 of `hi - lo`) — a
  *    sub-second model-sized job that runs only when a rewritable join
  *    was actually found, so users never hand-tune the conf. Opt out with
  *    `spark.graft.rangeJoin.autoBin=false` (then no conf → no rewrite).
  *
  * Runaway guard: one data-error interval (open-ended, wrong units) whose
  * span is vastly larger than `w` would make Sequence build a huge
  * per-row array — an executor OOM triggered by a query the conf was
  * never tuned for. `spark.graft.rangeJoin.maxBinsPerRow` (default 1000)
  * bounds the fan-out: exceeding rows raise a clear error naming both
  * confs instead of dying in an allocation.
  *
  * Equi-anchored joins (an equality conjunct exists, e.g. as-of joins
  * keyed by user) already plan as hash joins, so they are left alone by
  * default; `spark.graft.rangeJoin.binEquiJoins=true` opts them into
  * binning too — the composite (equi-key, bin) join key caps the per-key
  * probe width, which is what survives heavy-hitter keys at 100 TB.
  *
  * Scope guards: inner joins, deterministic conditions, numeric/timestamp
  * point types, and no `__graft_bin` attribute already present (the
  * rewrite's own output keeps both the bin equality and the original
  * range conjuncts, so without this guard the equi mode would re-fire on
  * its own output forever).
  */
object BinnedRangeJoinRule extends BinnedRangeJoinRule(None) {

  val BinSizeConf = "spark.graft.rangeJoin.binSize"
  val AutoBinConf = "spark.graft.rangeJoin.autoBin"
  val EquiConf = "spark.graft.rangeJoin.binEquiJoins"
  val MaxBinsConf = "spark.graft.rangeJoin.maxBinsPerRow"

  /** Per-plan memo of sampled widths, shared across sessions (the key is
    * the canonicalized interval subtree, which is session-independent):
    * the same query re-optimizes on every action (and the fixed-point
    * optimizer batches visit a join several times per compilation), and
    * the width for a given (interval side, bounds) is stable over a
    * compilation — cache it so the sampling job runs once per distinct
    * join, not once per visit. BOTH polarities expire (round-6 ADVICE):
    * failed samplings (empty side, transient error) retry after a short
    * TTL so a table that gains data gets re-priced, and successful
    * samplings expire after a longer TTL so a table that grows or shifts
    * its span distribution cannot keep a stale width for the JVM
    * lifetime. Bounded (drop oldest insertion) so a long-lived session
    * cannot leak plans. */
  private[plans] val NoneRetryMs = 30000L
  private[plans] val SomeTtlMs = 10 * 60 * 1000L
  private[plans] val widthCache =
    new java.util.LinkedHashMap[(LogicalPlan, Expression, Expression),
        (Option[Double], Long)](16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(LogicalPlan, Expression, Expression),
            (Option[Double], Long)]): Boolean = size() > 64
    }
}

class BinnedRangeJoinRule(sessionOpt: Option[SparkSession])
    extends Rule[LogicalPlan] with PredicateHelper {
  import BinnedRangeJoinRule._

  /** The session whose plans this rule instance compiles. Extension
    * injection binds the real session (GraftExtensions above); the
    * companion-object fallback resolves `active` only for direct
    * object-level use in tests — rule-time jobs must otherwise never
    * depend on which session a multi-session app happens to have made
    * active (round-6 ADVICE). */
  protected def session: SparkSession =
    sessionOpt.getOrElse(SparkSession.active)

  private def binnable(e: Expression): Boolean = e.dataType match {
    case _: NumericType | TimestampType => true
    case _ => false
  }

  /** floor(x / w) as a LongType bin id (timestamps cast through seconds). */
  private def bin(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  /** p50 of the interval spans, from one bounded aggregate over the
    * interval side — runs at rewrite time, only after a rewritable join
    * was found, at most once per distinct join (memoized). The input is
    * capped with a per-partition LocalLimit (no shuffle, no full scan):
    * a width heuristic needs a representative sample, not the exact p50.
    * None (→ no rewrite) on empty input, non-positive spans, or any
    * sampling failure: binning must never break a plan it cannot price. */
  private[plans] def sampledWidth(bound: LogicalPlan, lo: Expression,
      hi: Expression): Option[Double] = {
    val key = (bound.canonicalized, lo.canonicalized, hi.canonicalized)
    // an expired-but-known-good width: if the refresh fails transiently
    // (momentarily empty side, sampling error), fall back to it and
    // re-stamp instead of negative-caching — a valid width was known, and
    // disabling the rewrite for NoneRetryMs on a blip is strictly worse
    // (round-7 advice)
    var stale: Option[Double] = None
    widthCache.synchronized {
      val hit = widthCache.get(key)
      if (hit != null) {
        val age = System.currentTimeMillis() - hit._2
        val ttl = if (hit._1.isDefined) SomeTtlMs else NoneRetryMs
        if (age < ttl) return hit._1
        stale = hit._1
      }
    }
    // A SUCCESSFUL sample that determines None (empty side, non-positive
    // spans) is an authoritative "do not rewrite" and must replace a stale
    // width — the data the old width was priced on is gone. Only a sampling
    // FAILURE (exception) falls back to the stale width.
    val w =
      try {
        val span = Subtract(Cast(hi, DoubleType), Cast(lo, DoubleType))
        val p50 = new ApproximatePercentile(span, Literal(0.5))
          .toAggregateExpression()
        val agg = Aggregate(Nil, Seq(Alias(p50, "w")()),
          LocalLimit(Literal(10000), bound))
        val row = DatasetBridge.ofRows(session, agg).head()
        val got = if (row.isNullAt(0)) None
          else Some(row.getDouble(0)).filter(_ > 0)
        got.foreach(v => logInfo(s"binned range join: sampled bin width $v"))
        got
      } catch {
        case NonFatal(e) =>
          logWarning(s"binned range join: width sampling failed" +
            stale.fold(", leaving join unrewritten")(v =>
              s", keeping stale width $v") + s": ${e.getMessage}")
          stale
      }
    widthCache.synchronized {
      widthCache.put(key, (w, System.currentTimeMillis()))
    }
    w
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = conf.getConfString(BinSizeConf, "")
    // a malformed/nonpositive bin size must not fail UNRELATED queries in
    // the session (this rule runs on every plan): warn and stand down
    val confWidth = scala.util.Try(raw.toDouble).toOption.filter(_ > 0)
    if (raw.nonEmpty && confWidth.isEmpty)
      logWarning(s"ignoring invalid $BinSizeConf='$raw' (want a positive number)")
    val autoBin = conf.getConfString(AutoBinConf, "true") != "false"
    val equiToo = conf.getConfString(EquiConf, "false") == "true"
    val maxBins = scala.util.Try(
      conf.getConfString(MaxBinsConf, "1000").toLong).toOption
      .filter(_ > 0).getOrElse(1000L)
    if (confWidth.isEmpty && !autoBin) plan
    else {
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint)
            if cond.deterministic &&
              !cond.references.exists(_.name.startsWith("__graft_bin")) =>
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
          val triple = if (hasEqui && !equiToo) None
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
              confWidth.orElse(sampledWidth(boundPlan, lo, hi)) match {
                case None => j
                case Some(width) =>
                  val binPoint = Alias(bin(point, width), "__graft_bin")()
                  val pointProj =
                    Project(pointPlan.output :+ binPoint, pointPlan)
                  val binAttr =
                    AttributeReference("__graft_bin_span", LongType)()
                  val binLo = bin(lo, width)
                  val binHiRaw = bin(hi, width)
                  // fan-out guard: a span of more than maxBins bins fails
                  // loudly (naming both knobs) instead of allocating a
                  // runaway per-row array. NULL-safe: a NULL bound makes
                  // the span NULL — Catalyst If would take the FALSE
                  // branch and raise, but a NULL bound can never match
                  // the original predicate, so coalesce keeps it on the
                  // harmless path (one bin, then filtered out)
                  val err = new RaiseError(
                    Literal(s"range-join bin fan-out exceeds " +
                      s"$maxBins bins/row for bin width $width; raise " +
                      s"$BinSizeConf or $MaxBinsConf"))
                  val binHi = If(
                    Coalesce(Seq(
                      LessThanOrEqual(Subtract(binHiRaw, binLo),
                        Literal(maxBins)),
                      Literal(true))),
                    binHiRaw, Cast(err, LongType))
                  // Greatest guards inverted (empty) intervals: they emit
                  // one bin instead of crashing Sequence; the re-applied
                  // original condition filters them out
                  // Sequence is TimeZoneAwareExpression: post-analysis
                  // rules must fill timeZoneId themselves or the plan goes
                  // back to unresolved (ResolveTimeZone has already run)
                  val span = Sequence(binLo,
                    Greatest(Seq(binHi, binLo)),
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
}
