package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CHANGES/RESETS counters (st32) — the online twin of
  * `q_changes_resets`: per series, running counts of consecutive-point
  * value changes and decreases (counter resets). This is the alert-side
  * form of the diagnostic — "this gauge flapped N times this hour",
  * "this counter reset again" — maintained as events arrive instead of
  * recomputed from the lag window.
  *
  * State per series is the last value plus three longs — O(1), RocksDB-
  * ready. Pure double comparisons (no arithmetic), and the in-batch
  * order is the batch twin's exact (ts, event_id) sort, so after any
  * prefix of a series the emitted readout equals the batch query over
  * that prefix EXACTLY; StreamingSpec st32 pins this across a
  * micro-batch boundary.
  */
object StreamingChanges {

  import SeriesPoint.Point

  case class ChangeReadout(user_id: Long, n_pairs: Long, n_changes: Long,
      n_resets: Long)

  /** State: (hasPrev, prevValue, nPairs, nChanges, nResets). */
  def counters(events: DataFrame): Dataset[ChangeReadout] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Boolean, Double, Long, Long, Long),
        ChangeReadout](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Point],
            state: GroupState[(Boolean, Double, Long, Long, Long)]) =>
          var (hasPrev, prev, pairs, changes, resets) =
            state.getOption.getOrElse((false, 0.0, 0L, 0L, 0L))
          rows.toSeq.sortBy(SeriesPoint.orderKey).foreach { p =>
            if (hasPrev) {
              pairs += 1L
              if (p.value != prev) changes += 1L
              if (p.value < prev) resets += 1L
            }
            prev = p.value
            hasPrev = true
          }
          state.update((hasPrev, prev, pairs, changes, resets))
          Iterator.single(ChangeReadout(uid, pairs, changes, resets))
      }
  }
}
