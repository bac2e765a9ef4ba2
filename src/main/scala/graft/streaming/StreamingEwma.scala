package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ONLINE EWMA per series: the recurrence
  * `ewma := alpha * x + (1 - alpha) * ewma` applied as events arrive —
  * the canonical online metric smoother (what a TSDB alerting path runs
  * on ingest, versus the batch q_ewma's trailing-window form over stored
  * rows).
  *
  * Shape: state per series is ONE double — the smallest possible
  * stateful operator; one shuffle on the series key; RocksDB-ready like
  * every stateful op here (StreamingSpec st9). Determinism comes from
  * the in-batch fold order alone: rows fold in (ts, event_id) order, so
  * a replayed micro-batch (same contents, any arrival order) produces
  * identical state — what a monitoring pipeline needs for exactly-once
  * sinks.
  */
object StreamingEwma {

  import SeriesPoint.Point

  case class EwmaPoint(user_id: Long, event_id: Long, ewma: Double)

  /** `events` must carry user_id, ts, event_id, value; emits one smoothed
    * point per input row (append mode). */
  def smooth(events: DataFrame, alpha: Double = 0.3): Dataset[EwmaPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Double, EwmaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Point], state: GroupState[Double]) =>
          // deterministic full-precision fold order — SeriesPoint.orderKey
          val ordered = rows.toSeq.sortBy(SeriesPoint.orderKey)
          var cur = state.getOption
          val out = ordered.map { p =>
            val next = cur match {
              case Some(prev) => alpha * p.value + (1 - alpha) * prev
              case None => p.value // first point seeds the series
            }
            cur = Some(next)
            EwmaPoint(uid, p.event_id, next)
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
