package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ONLINE AR(2) fit per series (st38) — the exact online form
  * of batch q_ar_forecast: through-origin least squares of the value on
  * its own two lags, refit after every arrival. All five normal-equation
  * sums are int64 cent products accumulated incrementally (the state is
  * seven longs + the last two observations), so the running fit at any
  * point equals the batch fit over the same prefix EXACTLY — the 2×2
  * solve reuses the batch's fixed double operation order (det first,
  * then each coefficient), so the emitted micro-quantized coefficients
  * and one-step forecast are bit-identical to q_ar_forecast's at every
  * series' last event (st38 pins that fixpoint across a micro-batch
  * boundary, integer equality — no epsilon).
  *
  * Shape: O(1) state per series (9 longs), one shuffle on the series
  * key, RocksDB-ready — the StreamingEwma/StreamingKalman class.
  */
object StreamingAr {

  import SeriesPoint.Point

  case class ArState(prev1: Long, prev2: Long, n: Long,
      s11: Long, s12: Long, s22: Long, sy1: Long, sy2: Long, seen: Int)

  case class ArPoint(user_id: Long, event_id: Long, n: Long,
      ar1_micro: Long, ar2_micro: Long, forecast_micro: Long)

  private def micro(x: Double): Long =
    math.floor(x * 1000000.0 + 0.5).toLong

  /** `events` must carry user_id, ts, event_id, value; emits one row per
    * input row once the fit is defined (n ≥ 3 and det > 0), append mode. */
  def fit(events: DataFrame): Dataset[ArPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .filter(col("value").isNotNull) // mirror the batch twin's filter
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ArState, ArPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Point], state: GroupState[ArState]) =>
          val ordered = rows.toSeq.sortBy(SeriesPoint.orderKey)
          var st = state.getOption.getOrElse(
            ArState(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0))
          val out = ordered.flatMap { p =>
            val cv = SeriesPoint.cents(p.value)
            // rows with both lags defined update the normal equations
            st =
              if (st.seen >= 2)
                ArState(cv, st.prev1, st.n + 1,
                  st.s11 + st.prev1 * st.prev1,
                  st.s12 + st.prev1 * st.prev2,
                  st.s22 + st.prev2 * st.prev2,
                  st.sy1 + st.prev1 * cv,
                  st.sy2 + st.prev2 * cv, st.seen + 1)
              else ArState(cv, st.prev1, st.n, st.s11, st.s12, st.s22,
                st.sy1, st.sy2, st.seen + 1)
            // batch double order: det, then each coefficient, then the
            // forecast from the (now-shifted) last two observations
            val det = st.s11.toDouble * st.s22.toDouble -
              st.s12.toDouble * st.s12.toDouble
            if (st.n >= 3 && det > 0.0) {
              val b1 = (st.s22.toDouble * st.sy1.toDouble -
                st.s12.toDouble * st.sy2.toDouble) / det
              val b2 = (st.s11.toDouble * st.sy2.toDouble -
                st.s12.toDouble * st.sy1.toDouble) / det
              Some(ArPoint(uid, p.event_id, st.n, micro(b1), micro(b2),
                micro(b1 * st.prev1.toDouble + b2 * st.prev2.toDouble)))
            } else None
          }
          state.update(st)
          out.iterator
      }
  }
}
