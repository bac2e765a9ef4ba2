package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ONLINE 1-D Kalman filter per series (st34) — the exact
  * online form of batch q_kalman_smooth: random-walk state model,
  *   P⁻ = P + Q;  K = P⁻/(P⁻+R);  x̂' = x̂ + K·(z − x̂);  P' = (1−K)·P⁻
  * applied as events arrive. Where StreamingEwma's gain is a constant
  * α, the Kalman gain adapts: near 1 on a fresh series (trust the first
  * observations), converging to the steady-state Riccati value — so a
  * just-created series locks on fast without a separate warm-up rule.
  *
  * Shape: TWO doubles of state per series (x̂, P) — same minimal-state
  * class as StreamingEwma/StreamingHoltWinters; one shuffle on the
  * series key; RocksDB-ready (StreamingSpec st9). Determinism: rows
  * fold in (ts, event_id) order inside each micro-batch, so replayed
  * batches produce identical state, and the full-history fold is
  * bit-identical to batch q_kalman_smooth's SeriesFold (st34 pins the
  * fixpoint at every series' last event across a batch boundary).
  */
object StreamingKalman {

  import SeriesPoint.Point

  case class KalmanPoint(user_id: Long, event_id: Long,
      x_hat: Double, p_var: Double)

  /** `events` must carry user_id, ts, event_id, value; emits one
    * filtered point per input row (append mode). */
  def smooth(events: DataFrame, q: Double = 0.04,
      r: Double = 1.0): Dataset[KalmanPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      // mirror the batch twin's `value IS NOT NULL`: Point.value is a
      // non-nullable Double, so a null measurement would throw in the
      // encoder instead of being skipped like backfill skips it
      .filter(col("value").isNotNull)
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Double, Double), KalmanPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Point],
            state: GroupState[(Double, Double)]) =>
          val ordered = rows.toSeq.sortBy(SeriesPoint.orderKey)
          var cur = state.getOption
          val out = ordered.map { p =>
            val next = cur match {
              case Some((x, pv)) =>
                val pp = pv + q
                val k = pp / (pp + r)
                (x + k * (p.value - x), (1.0d - k) * pp)
              case None => (p.value, 1.0d) // seed: x̂=z₁, P=1
            }
            cur = Some(next)
            KalmanPoint(uid, p.event_id, next._1, next._2)
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
