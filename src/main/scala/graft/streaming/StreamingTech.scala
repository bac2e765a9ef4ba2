package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming RSI/CMO momentum readout (st33) — the online twin of
  * `q_tech_indicators`: per series, running gain/loss cent-sums over
  * consecutive deltas, emitted as the post-batch RSI and CMO. The
  * monitoring-path form of the indicator — "momentum flipped negative
  * this hour" — maintained at arrival instead of recomputed from the
  * lag window.
  *
  * State per series: last cents value + three longs. All-integer
  * arithmetic, the batch query's exact half-up division through
  * abs-then-sign, and the batch (ts, event_id) in-batch order — so the
  * emitted readout after any prefix equals the batch query over that
  * prefix EXACTLY (constant prefixes report None like the batch NULL).
  * StreamingSpec st33 pins this across a micro-batch boundary.
  */
object StreamingTech {

  import SeriesPoint.Point

  case class TechReadout(user_id: Long, n_pairs: Long, sum_gain: Long,
      sum_loss: Long, rsi_micro: Option[Long], cmo_micro: Option[Long])

  /** State: (hasPrev, prevCents, nPairs, sumGain, sumLoss). */
  def indicators(events: DataFrame): Dataset[TechReadout] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Boolean, Long, Long, Long, Long),
        TechReadout](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Point],
            state: GroupState[(Boolean, Long, Long, Long, Long)]) =>
          var (hasPrev, prev, pairs, gain, loss) =
            state.getOption.getOrElse((false, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(SeriesPoint.orderKey).foreach { p =>
            val c = SeriesPoint.cents(p.value)
            if (hasPrev) {
              pairs += 1L
              val d = c - prev
              if (d > 0) gain += d else loss -= d
            }
            prev = c
            hasPrev = true
          }
          state.update((hasPrev, prev, pairs, gain, loss))
          val den = gain + loss
          val readout =
            if (den > 0) {
              val rsi = (gain * 100000000L + den / 2L) / den
              val diff = gain - loss
              val cmo = (if (diff >= 0) 1L else -1L) *
                ((math.abs(diff) * 100000000L + den / 2L) / den)
              TechReadout(uid, pairs, gain, loss, Some(rsi), Some(cmo))
            } else TechReadout(uid, pairs, gain, loss, None, None)
          Iterator.single(readout)
      }
  }
}
