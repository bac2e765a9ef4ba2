package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling exact median — the online twin of q_moving_median:
  * per series, the lower median of the trailing 11 points as events
  * arrive. State per series is a RING of at most 11 int64 cents (the
  * window content, nothing else), so this is the bounded-state analog
  * of the batch collect_list window: RocksDB-ready, O(window) not
  * O(series). All values are integer cents and the median is a sorted-
  * array ELEMENT (the batch form's no-interpolation rule), so the
  * backfill==online fixpoint is EXACT integer equality (st25).
  *
  * ORDERING PRECONDITION: rows are folded in [[SeriesPoint.orderKey]]
  * order within each micro-batch only — a row arriving a micro-batch
  * AFTER a later row of its series enters the ring out of order and
  * silently shifts every subsequent median. The st25 fixpoint holds only
  * under globally-ordered per-series ingestion (the engine gateway's
  * monotone event_ids); see [[StreamingRate]] for the shared contract
  * and the buffering recipe for reordering sources.
  */
object StreamingMovingMedian {

  import SeriesPoint.Point

  case class MedianPoint(user_id: Long, event_id: Long, cents: Long,
      n_win: Long, med_cents: Long)

  /** `events` must carry user_id, ts, event_id, value; emits the rolling
    * window size and lower median after every input row. */
  def median(events: DataFrame, window: Int = 11): Dataset[MedianPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Long], MedianPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Point], state: GroupState[List[Long]]) =>
          val ordered = rows.toSeq.sortBy(SeriesPoint.orderKey)
          var win = state.getOption.getOrElse(Nil) // newest first
          val out = ordered.map { p =>
            val c = SeriesPoint.cents(p.value)
            win = (c :: win).take(window)
            val sorted = win.sorted
            MedianPoint(uid, p.event_id, c, win.length.toLong,
              sorted((win.length + 1) / 2 - 1))
          }
          state.update(win)
          out.iterator
      }
  }
}
