package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming linear trend — the online twin of q_predict_linear (the
  * PromQL deriv/predict_linear primitives): per series, the running OLS
  * fit of value on time, emitting the slope and the one-hour-ahead
  * prediction after every point.
  *
  * ALL state is the five exact int64 regression sums plus the series'
  * time anchor (n, Σt, Σv, Σtv, Σt², t0_µs — six longs): sums
  * of products of bounded ints are order-free and engine-exact, so the
  * backfill==online fixpoint is EXACT on the integer state; fp enters
  * only in the emit-time formula, computed from the same integers in
  * the same fixed order as the batch form — so the emitted micros are
  * equal too, not just close (st29). One shuffle on the series key;
  * O(1) state per series, the st13/st23 contract.
  *
  * ORDERING PRECONDITION (the [[StreamingRate]] family contract): t is
  * anchored at the series' FIRST ARRIVAL, which equals the batch form's
  * min(ts) only under globally-ordered per-series ingestion (the engine
  * gateway's monotone-id path), and the last-emitted prediction anchors
  * on the current point's t being the series maximum — the same
  * contract. See StreamingRate's scaladoc for the shared terms and the
  * buffering recipe for reordering sources.
  */
object StreamingOls {

  import SeriesPoint.Point

  case class OlsPoint(user_id: Long, event_id: Long, n: Long,
      deriv_micro: Option[Long], predict_micro: Option[Long])

  /** (n, st, sv, stv, stt, t0_us). */
  private type St = (Long, Long, Long, Long, Long, Long)

  /** `events` must carry user_id, ts, event_id, value; emits the running
    * fit after every input row — None until the fit is determined
    * (n ≥ 2 over >0 elapsed time, the batch HAVING mirror), so the LAST
    * emitted row per series equals the batch row exactly. NULL-value
    * rows are dropped HERE, mirroring the batch twin's
    * `value IS NOT NULL` — without the filter a null would kill the
    * typed stream (non-nullable Double decode), not skip the row. */
  def fit(events: DataFrame): Dataset[OlsPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("value").isNotNull)
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[St, OlsPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Point], state: GroupState[St]) =>
          val ordered = rows.toSeq.sortBy(SeriesPoint.orderKey)
          var cur = state.getOption.getOrElse((0L, 0L, 0L, 0L, 0L, 0L))
          val out = ordered.map { p =>
            val (n0, st0, sv0, stv0, stt0, t00) = cur
            val us = SeriesPoint.epochUs(p.ts)
            val t0 = if (n0 == 0L) us else t00
            // non-negative under ordered arrival → floorDiv == the batch
            // intDiv canon
            val tt = Math.floorDiv(us - t0, 1000000L)
            // batch cents canon is round(value*100) = sign-correct
            // HALF_UP — SeriesPoint.cents IS that definition
            val cv = SeriesPoint.cents(p.value)
            val n = n0 + 1L
            val st = st0 + tt
            val sv = sv0 + cv
            val stv = stv0 + tt * cv
            val stt = stt0 + tt * tt
            cur = (n, st, sv, stv, stt, t0)
            val den = n.toDouble * stt.toDouble - st.toDouble * st.toDouble
            val (dm, pm) =
              if (n >= 2L && den > 0.0) {
                val slope = (n.toDouble * stv.toDouble -
                  st.toDouble * sv.toDouble) / den
                (Some(math.floor(slope * 1000000.0 + 0.5).toLong),
                  Some(math.floor(
                    ((sv.toDouble - slope * st.toDouble) / n.toDouble
                      + slope * (tt.toDouble + 3600.0))
                      * 1000000.0 + 0.5).toLong))
              } else (None, None)
            OlsPoint(uid, p.event_id, n, dm, pm)
          }
          state.update(cur)
          out.iterator
      }
  }
}
