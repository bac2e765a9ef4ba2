package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Deadman alerting — "tell me when a series goes SILENT", the inverse of
  * every other monitor here (which can only react to data that arrives;
  * silence produces no rows to react to). The InfluxDB/Kapacitor deadman
  * staple, expressed with the one Structured Streaming surface built for
  * absence: per-key EVENT-TIME state timeouts. Each arriving point re-arms
  * its series' timeout at (event time + silenceFor); when the WATERMARK
  * passes an armed deadline with no new data having re-armed it, Spark
  * invokes the group with hasTimedOut=true and the alert row is emitted.
  *
  * Event-time (not processing-time) timeouts make the alert REPLAYABLE:
  * a backfill through the same history fires the same alerts at the same
  * watermark positions, so the checkpoint-recovery story of every other
  * operator here applies to the absence detector too. State per series is
  * one (lastSeen, count) pair; silence detection costs no polling — the
  * state store's timeout index carries it.
  */
object StreamingDeadman {

  case class DeadmanAlert(user_id: Long, last_seen: java.sql.Timestamp,
      n_points: Long, alert: String)

  import SeriesPoint.Point

  /** `events` must carry user_id, ts, event_id, value. The watermark (the
    * timeout clock) is applied HERE, after the canonical projection — a
    * caller-side watermark would be dropped by the internal cast/select
    * (watermark metadata rides the specific attribute it was declared
    * on). Emits one alert row per series per silence episode; a series
    * resuming after an alert re-arms. */
  def alerts(events: DataFrame, silenceMs: Long,
      watermarkDelay: String = "5 seconds"): Dataset[DeadmanAlert] = {
    require(silenceMs > 0, s"silenceMs must be positive: $silenceMs")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .withWatermark("ts", watermarkDelay)
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long), DeadmanAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Point],
            state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed lastSeen + silenceFor with no arrivals
            val (lastSeen, n) = state.get
            state.remove() // next arrival re-arms a fresh episode
            Iterator.single(DeadmanAlert(uid,
              new java.sql.Timestamp(lastSeen), n,
              s"no points for ${silenceMs}ms"))
          } else {
            val pts = rows.toSeq
            val newest = pts.map(p =>
              Math.floorDiv(p.ts.getTime, 1000L) * 1000L +
                p.ts.getNanos / 1000000L).max
            val (prevSeen, prevN) = state.getOption.getOrElse((0L, 0L))
            val lastSeen = math.max(prevSeen, newest)
            state.update((lastSeen, prevN + pts.length))
            state.setTimeoutTimestamp(lastSeen + silenceMs)
            Iterator.empty
          }
      }
  }
}
