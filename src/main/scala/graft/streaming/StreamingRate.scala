package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counter-reset-aware rate — the online twin of
  * q_rate_counter (the Prometheus increase()/rate() recipe): per series,
  * a step contributes v−prev when monotone and v itself after a reset
  * (counter restarted from 0; the extrapolation-free lower bound).
  *
  * ALL state is integer (last cents, accumulated increase cents, reset
  * count, first/last event time in µs, point count — six longs), so the
  * backfill==online fixpoint is EXACT equality, not an fp bound: the
  * only fp op anywhere is the final rate division at emit time, computed
  * from the same integers in the same fixed order as the batch form's
  * micro() canon. One shuffle on the series key; RocksDB-ready O(1)
  * state per series, same as st13/st16.
  *
  * ORDERING PRECONDITION (shared with st13/st16/st25/st26, the price of
  * O(1) state): rows are folded in [[SeriesPoint.orderKey]] order WITHIN
  * each micro-batch, but a row arriving in a LATER micro-batch than a
  * successor of its series is folded against already-advanced state
  * (last/t0 here) — the fixpoint holds only when ingestion is globally
  * ordered per series (true of the engine's own gateway path, which
  * assigns monotone event_ids at arrival). A source that can reorder
  * across batch boundaries needs a caller-side
  * `withWatermark + window` buffer stage in front, or the deadman-style
  * explicit-lateness handling of [[StreamingDeadman]] — O(1)-state folds
  * cannot retroactively reorder what they already consumed.
  *
  * The shared contract also requires NULL-value rows filtered upstream
  * (the batch twins' `value IS NOT NULL`): the typed `.as[Point]` decode
  * has a primitive Double slot, so a null kills the query instead of
  * skipping the row ([[StreamingOls]] filters internally; the engine
  * gateway never emits null field values).
  */
object StreamingRate {

  import SeriesPoint.Point

  case class RatePoint(user_id: Long, event_id: Long, n_points: Long,
      n_resets: Long, increase_cents: Long, rate_micro: Option[Long])

  /** (last_cents, inc_cents, resets, t0_us, t1_us, n). */
  private type St = (Long, Long, Long, Long, Long, Long)

  /** `events` must carry user_id, ts, event_id, value; emits the running
    * (n_points, n_resets, increase_cents, rate) after every input row.
    * rate_micro is None until the series spans >0 elapsed time with ≥2
    * points — mirroring the batch query's HAVING filter, so the LAST
    * emitted row per series equals the batch row exactly. */
  def rate(events: DataFrame): Dataset[RatePoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[St, RatePoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Point], state: GroupState[St]) =>
          val ordered = rows.toSeq.sortBy(SeriesPoint.orderKey)
          var cur = state.getOption.getOrElse((0L, 0L, 0L, 0L, 0L, 0L))
          val out = ordered.map { p =>
            val (last, inc0, res0, t00, t10, n0) = cur
            val c = SeriesPoint.cents(p.value)
            val us = SeriesPoint.epochUs(p.ts)
            val (inc, res) =
              if (n0 == 0L) (0L, 0L)
              else if (c < last) (inc0 + c, res0 + 1L)
              else (inc0 + (c - last), res0)
            val t0 = if (n0 == 0L) us else t00
            cur = (c, inc, res, t0, us, n0 + 1L)
            val rate =
              if (n0 + 1L >= 2L && us > t0)
                Some(math.floor((inc.toDouble / 100.0)
                  / ((us - t0).toDouble / 1000000.0) * 1000000.0 + 0.5)
                  .toLong)
              else None
            RatePoint(uid, p.event_id, n0 + 1L, res, inc, rate)
          }
          state.update(cur)
          out.iterator
      }
  }
}
