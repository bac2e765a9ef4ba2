package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Input row for [[WeightedAvg]]: a value and its (time) weight. */
case class ValueWeight(value: Double, weight: Double)

/** Mutable partial state: (sum of weights, sum of value*weight). */
case class WAvgBuf(var wsum: Double, var vwsum: Double)

/** Weighted average as a typed `Aggregator` — the UDAF surface of
  * SURVEY.md §2.4k (the reference has no user-function mechanism at all;
  * GlueSQL 0.9 predates UDF support).
  *
  * Used for the time-weighted average: weight = seconds until the next
  * observation, so irregularly-sampled series average correctly.
  * Registered via `functions.udaf`, which plans as a regular two-phase
  * (partial + merge) aggregate — scales like any built-in agg.
  */
object WeightedAvg extends Aggregator[ValueWeight, WAvgBuf, Double] {
  override def zero: WAvgBuf = WAvgBuf(0.0, 0.0)

  override def reduce(b: WAvgBuf, a: ValueWeight): WAvgBuf = {
    b.wsum += a.weight
    b.vwsum += a.value * a.weight
    b
  }

  override def merge(b1: WAvgBuf, b2: WAvgBuf): WAvgBuf =
    WAvgBuf(b1.wsum + b2.wsum, b1.vwsum + b2.vwsum)

  override def finish(b: WAvgBuf): Double =
    if (b.wsum == 0.0) Double.NaN else b.vwsum / b.wsum

  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
