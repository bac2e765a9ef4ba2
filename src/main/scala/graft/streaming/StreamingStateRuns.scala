package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming state-transition detection — the online twin of
  * q_state_runs: per series, consecutive same-state events accumulate in
  * O(1) state (current type, run length, start/last time, first id) and
  * a CLOSED run is emitted the moment the state changes. This is the
  * alerting-path form of the batch islands query: the batch backfill
  * reports all runs including each series' still-open last one, the
  * stream reports a run exactly when it closes — so the fixpoint
  * (st26) is: streamed closed runs == batch runs minus each series'
  * final run, with EXACT integer equality throughout.
  *
  * ORDERING PRECONDITION: rows are folded in orderKey order within each
  * micro-batch only — a row arriving a micro-batch after a later row of
  * its series would split or extend the wrong run. The st26 fixpoint
  * holds only under globally-ordered per-series ingestion (the engine
  * gateway's monotone event_ids); see [[StreamingRate]] for the shared
  * contract and the buffering recipe for reordering sources.
  */
object StreamingStateRuns {

  case class TypedPoint(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String)

  case class StateRun(user_id: Long, event_type: String, run_len: Long,
      t_start_us: Long, elapsed_us: Long, first_event_id: Long)

  /** (type, run_len, t_start_us, last_us, first_event_id). */
  private type St = (String, Long, Long, Long, Long)

  private def orderKey(p: TypedPoint): (Long, Int, Long) =
    (Math.floorDiv(p.ts.getTime, 1000L), p.ts.getNanos, p.event_id)

  /** `events` must carry user_id, ts, event_id, event_type; emits each
    * run as it CLOSES (the series' trailing run stays in state). */
  def runs(events: DataFrame, minLen: Long = 3L): Dataset[StateRun] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("event_type").cast("string"))
      .as[TypedPoint]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[St, StateRun](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[TypedPoint], state: GroupState[St]) =>
          val ordered = rows.toSeq.sortBy(orderKey)
          var cur = state.getOption.orNull
          val out = Seq.newBuilder[StateRun]
          ordered.foreach { p =>
            val us = SeriesPoint.epochUs(p.ts)
            cur match {
              case (tp, len, t0, last, fid) if tp == p.event_type =>
                cur = (tp, len + 1L, t0, us, fid)
              case (tp, len, t0, last, fid) =>
                if (len >= minLen)
                  out += StateRun(uid, tp, len, t0, last - t0, fid)
                cur = (p.event_type, 1L, us, us, p.event_id)
              case null =>
                cur = (p.event_type, 1L, us, us, p.event_id)
            }
          }
          state.update(cur)
          out.result().iterator
      }
  }
}
