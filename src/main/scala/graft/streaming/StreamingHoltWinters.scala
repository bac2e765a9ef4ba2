package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ONLINE Holt-Winters (double exponential smoothing) per
  * series: the level+trend recurrence
  * `l' = alpha*x + (1-alpha)*(l + b); b' = beta*(l' - l) + (1-beta)*b`
  * applied as events arrive — the trend-aware smoother an alerting path
  * runs to project the next point (`forecast = l + b`), versus
  * [[StreamingEwma]]'s level-only form and the batch `q_holt_winters`
  * backfill over stored history (StreamingSpec st16 asserts the two
  * agree at the fixpoint, like st13b does for EWMA).
  *
  * Shape: state per series is TWO doubles; one shuffle on the series
  * key; RocksDB-ready like every stateful op here. Determinism comes
  * from the in-batch (ts, event_id) fold order, so replayed
  * micro-batches produce identical state — what exactly-once sinks
  * need.
  */
object StreamingHoltWinters {

  import SeriesPoint.Point

  case class HwPoint(user_id: Long, event_id: Long, level: Double,
      trend: Double, forecast_next: Double)

  /** `events` must carry user_id, ts, event_id, value; emits one smoothed
    * point per input row (append mode). */
  def smooth(events: DataFrame, alpha: Double = 0.5,
      beta: Double = 0.3): Dataset[HwPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Double, Double), HwPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Point],
            state: GroupState[(Double, Double)]) =>
          // deterministic full-precision fold order — SeriesPoint.orderKey
          val ordered = rows.toSeq.sortBy(SeriesPoint.orderKey)
          var cur = state.getOption
          val out = ordered.map { p =>
            val (l, b) = cur match {
              case Some((pl, pb)) =>
                // same op order as the batch fold (l' inlined into b')
                val nl = alpha * p.value + (1 - alpha) * (pl + pb)
                (nl, beta * (nl - pl) + (1 - beta) * pb)
              case None => (p.value, 0.0) // first point seeds the series
            }
            cur = Some((l, b))
            HwPoint(uid, p.event_id, l, b, l + b)
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
