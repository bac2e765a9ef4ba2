package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY.md §2.4 e: Q19-Q22) — absent in the reference,
  * core to a timeseries superset (deltas, moving averages, top-k per series).
  *
  * All windows partition by user_id (the "series" key) — one shuffle, then
  * every function below is computed in a single pass per partition. Window
  * ORDER BY always includes event_id so the order is total (ts alone can
  * tie); at 100 TB this plan is shuffle-once-per-key, no joins.
  */
object WindowQueries extends QuerySet {

  val queries: Map[String, Q] = Map(
    // Q19: ranking family over a total per-user order.
    "q19_ranking" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("event_id"))
    },

    // Q20: analytic family — deltas between consecutive points (the TSDB
    // derivative), gap to next event, first/last in frame.
    "q20_analytics" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      t(s, dir, "events")
        .select(col("event_id"),
          r6(col("value") - lag(col("value"), 1).over(w)).as("delta"),
          r6(lead(col("ts"), 1).over(w).cast("double") -
             col("ts").cast("double")).as("gap_s"),
          first(col("value")).over(wAll).as("first_value"),
          last(col("value")).over(wFwd).as("last_value"))
        .orderBy(col("event_id"))
    },

    // Q21: frame specs — moving sum/avg (ROWS), running total (ROWS
    // UNBOUNDED), and a time-range frame (RANGE over day offsets).
    "q21_frames" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wMov = w.rowsBetween(-3, Window.currentRow)
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wRange = Window.partitionBy(col("user_id"))
        .orderBy(col("days"))
        .rangeBetween(-7, Window.currentRow)
      t(s, dir, "events")
        .withColumn("days", datediff(col("ts"), lit("2024-01-01")))
        .select(col("event_id"),
          sum(dec(col("value"))).over(wMov).cast("double").as("mov_sum"),
          r6(avg(col("value")).over(wMov)).as("mov_avg"),
          sum(dec(col("value"))).over(wRun).cast("double").as("run_total"),
          count(lit(1)).over(wRange).as("n_7d"))
        .orderBy(col("event_id"))
    },

    // Q22: top-k per group — latest 3 events per user.
    "q22_topk_per_group" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("rn"), col("event_id"),
          ntz(col("ts")).as("ts"))
        .orderBy(col("user_id"), col("rn"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q19_ranking" ->
      """SELECT event_id, user_id,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rk,
        |  dense_rank() OVER w AS drk,
        |  ntile(4) OVER w AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
        |ORDER BY event_id""".stripMargin,

    "q20_analytics" ->
      """SELECT event_id,
        |  round(value - lag(value, 1) OVER w, 6) AS delta,
        |  round(epoch(lead(ts, 1) OVER w) - epoch(ts), 6) AS gap_s,
        |  first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value,
        |  last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q21_frames" ->
      """WITH e AS (SELECT *, datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days FROM events)
        |SELECT event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS mov_avg,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total,
        |  count(*) OVER (PARTITION BY user_id ORDER BY days
        |    RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS n_7d
        |FROM e ORDER BY event_id""".stripMargin,

    "q22_topk_per_group" ->
      """SELECT user_id, rn, event_id, ts FROM (
        |  SELECT user_id, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin
  )
}
