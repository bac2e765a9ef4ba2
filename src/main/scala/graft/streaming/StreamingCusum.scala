package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift monitor — the alerting-path twin of
  * q_anomaly_cusum: S := max(0, S + ((x − μ)/σ − k)) per series, alarm
  * while S > h. Where the batch query derives μ/σ from the full stored
  * history (retrospective changepoint detection), the monitor takes them
  * as FIXED reference parameters — how production CUSUM actually runs: μ/σ
  * are trained on a reference window (e.g. the batch q_welford_moments
  * output) and the online fold then watches for drift AWAY from that
  * reference; recomputing the baseline from the drifting stream itself
  * would absorb exactly the shift being hunted.
  *
  * State per series is ONE double; one shuffle on the series key;
  * deterministic in-batch fold order (SeriesPoint.orderKey) like every
  * smoother here, so a replayed micro-batch reproduces identical alarms.
  */
object StreamingCusum {

  import SeriesPoint.Point

  case class CusumPoint(user_id: Long, event_id: Long,
      s: Double, alarmed: Boolean)

  /** `events` must carry user_id, ts, event_id, value; emits the running
    * CUSUM statistic and alarm flag per input row. */
  def monitor(events: DataFrame, mu: Double, sigma: Double,
      slack: Double = 0.5, threshold: Double = 4.0): Dataset[CusumPoint] = {
    require(sigma > 0.0, s"sigma must be positive: $sigma")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Double, CusumPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Point], state: GroupState[Double]) =>
          val ordered = rows.toSeq.sortBy(SeriesPoint.orderKey)
          var s = state.getOption.getOrElse(0.0)
          val out = ordered.map { p =>
            s = math.max(0.0, s + ((p.value - mu) / sigma - slack))
            CusumPoint(uid, p.event_id, s, s > threshold)
          }
          state.update(s)
          out.iterator
      }
  }
}
