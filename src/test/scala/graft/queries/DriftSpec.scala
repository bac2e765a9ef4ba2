package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property pin for q_drift_ks: the cross-multiplied integer KS
  * recomputed by a NAIVE in-test two-sample implementation (sort both
  * samples, walk the union grid, track ECDF gaps in exact rationals),
  * so the windowed formulation can't drift from the textbook D
  * statistic. */
class DriftSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_drift_ks equals a naive exact two-sample KS per (type, week) " +
      "pair, sits in [0, 1e6], and is non-vacuous (some drift > 0)") {
    val raw = graft.Tables.load(spark, dir, "events")
      .select(col("event_type"),
        (unix_micros(col("ts")) / 604800000000L).cast("long").as("wk"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byKey = raw.groupBy(t => (t._1, t._2))
      .map { case (k, vs) => k -> vs.map(_._3).sorted.toSeq }
    def naiveKs(a: Seq[Long], b: Seq[Long]): Long = {
      val grid = (a ++ b).distinct.sorted
      val nA = a.length.toLong; val nB = b.length.toLong
      val dmax = grid.map { v =>
        val cumA = a.count(_ <= v).toLong
        val cumB = b.count(_ <= v).toLong
        math.abs(cumA * nB - cumB * nA)
      }.max
      dmax * 1000000L / (nA * nB)
    }
    val expected = byKey.keys.toSeq
      .flatMap { case (ty, wk) =>
        byKey.get((ty, wk - 1L)).map { prev =>
          val cur = byKey((ty, wk))
          (ty, wk, cur.length.toLong, prev.length.toLong,
            naiveKs(cur, prev))
        }
      }.sortBy(t => (t._1, t._2))
    val got = graft.SparkEntry.queries("q_drift_ks")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.forall(r => r._5 >= 0L && r._5 <= 1000000L),
      "KS out of [0, 1]")
    assert(got.exists(_._5 > 0L), "vacuity: zero drift everywhere")
    assert(got.nonEmpty, "vacuity: no adjacent week pairs")
  }
}
