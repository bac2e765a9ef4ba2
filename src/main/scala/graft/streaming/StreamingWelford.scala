package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ONLINE moments per series — Welford's numerically stable
  * one-pass mean/variance recurrence applied as events arrive:
  *
  *   n' = n + 1;  d = x − mean;  mean' = mean + d/n';
  *   M2' = M2 + d·(x − mean')
  *
  * This is the alerting-path primitive behind an online z-score (score
  * each point against the mean/variance of everything seen so far),
  * complementing q_stat_anomaly's trailing-window batch form and
  * st13's EWMA: state per series is THREE doubles, one shuffle on the
  * series key, RocksDB-ready. The naive sum/sum-of-squares form loses
  * catastrophically at large n (sum² − n·mean² cancels); Welford's
  * update is the textbook fix and — unlike the naive form — matches the
  * batch SeriesFold twin (q_welford_moments) bit for bit, because both
  * run the identical op sequence in the identical order
  * (SeriesPoint.orderKey).
  */
object StreamingWelford {

  import SeriesPoint.Point

  case class MomentPoint(user_id: Long, event_id: Long,
      mean_run: Double, var_run: Double)

  /** `events` must carry user_id, ts, event_id, value; emits one
    * (running mean, running sample variance) point per input row.
    * var_run is 0.0 for a series' first point (n−1 denominator
    * undefined), mirroring the batch twin's CASE. State is the
    * (n, mean, M2) triple as a plain tuple. */
  def moments(events: DataFrame): Dataset[MomentPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double, Double), MomentPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Point],
            state: GroupState[(Long, Double, Double)]) =>
          val ordered = rows.toSeq.sortBy(SeriesPoint.orderKey)
          var cur = state.getOption.getOrElse((0L, 0.0, 0.0))
          val out = ordered.map { p =>
            val (n0, mean0, m20) = cur
            // first point seeds (1, x, 0) — identical to the batch seed
            val n = n0 + 1L
            val d = p.value - mean0
            val mean = if (n0 == 0L) p.value else mean0 + d / n
            val m2 = if (n0 == 0L) 0.0 else m20 + d * (p.value - mean)
            cur = (n, mean, m2)
            MomentPoint(uid, p.event_id, mean,
              if (n > 1L) m2 / (n - 1L) else 0.0)
          }
          state.update(cur)
          out.iterator
      }
  }
}
