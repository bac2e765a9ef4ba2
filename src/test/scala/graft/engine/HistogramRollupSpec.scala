package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The quantile histogram rollup: per-(series, day, field) log-binned
  * value histograms that MERGE by count addition across any day range —
  * the mergeable-summary complement to the HLL sketch rollup, for
  * percentiles. Pinned here: accuracy vs the exact percentile (≤ ~0.5%
  * relative by bin construction), cross-day mergeability, no-raw-scan
  * plans, zero/negative handling, and drop/retention symmetry.
  */
class HistogramRollupSpec extends SparkSpec {

  private def exactQ(xs: Seq[Double], q: Double): Double = {
    // lower-nearest-rank: the first value whose rank reaches q*n — the
    // same "first bin reaching the cumulative target" rule the rollup
    // answers with, so the two agree up to bin width
    val s = xs.sorted
    s(math.max(0, math.ceil(q * s.length).toInt - 1))
  }

  test("histogram quantiles match exact percentiles within bin error") {
    val e = new Engine(spark, tmpDir("graft-hist"))
    val vals = (1 to 1000).map(i => i * 0.37)
    e.ingestLines(vals.zipWithIndex.map { case (v, i) =>
      f"hq,host=a v=$v%.6f ${1700000000000000000L + i * 1000000000L}"
    })
    e.histogramRollup()
    val rows = e.approxQuantiles("hq", "v", "2023-11-14", "2023-11-15",
      Seq(0.5, 0.95, 0.99)).collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val q = r.getDouble(0); val got = r.getDouble(1)
      val want = exactQ(vals.map(BigDecimal(_).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble), q)
      assert(math.abs(got - want) / want <= 0.01,
        s"q=$q: approx $got vs exact $want")
      assert(r.getLong(2) == 1000)
    }
  }

  test("per-day histograms merge across a day range by count addition") {
    val e = new Engine(spark, tmpDir("graft-hist2"))
    // day 1: 1..100, day 2: 101..200 — the range-median (100.5-ish) is
    // only reachable if the two days' bins truly merge
    val d1 = (1 to 100).map(v =>
      s"hm,host=a v=$v.0 ${1700000000000000000L + v * 1000000000L}")
    val d2 = (101 to 200).map(v =>
      s"hm,host=a v=$v.0 ${1700086400000000000L + v * 1000000000L}")
    e.ingestLines(d1 ++ d2)
    e.histogramRollup()
    val both = e.approxQuantiles("hm", "v", "2023-11-14", "2023-11-15",
      Seq(0.5)).head()
    assert(both.getLong(2) == 200)
    assert(math.abs(both.getDouble(1) - 100.0) / 100.0 <= 0.01)
    // single-day slice answers from that day's bins alone
    val one = e.approxQuantiles("hm", "v", "2023-11-15", "2023-11-15",
      Seq(0.5)).head()
    assert(one.getLong(2) == 100)
    assert(math.abs(one.getDouble(1) - 150.0) / 150.0 <= 0.01)
  }

  test("the answer plan reads the rollup, not the measurement files") {
    val e = new Engine(spark, tmpDir("graft-hist3"))
    e.ingestLines(Seq("hp,host=a v=42 1700000000000000000"))
    e.histogramRollup()
    val plan = e.approxQuantiles("hp", "v", "2023-11-14", "2023-11-14")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hist_daily"), "reads the rollup table")
    assert(!plan.contains("ingest_batch"), "no raw measurement scan")
  }

  test("zero and negative values keep sign and magnitude") {
    val e = new Engine(spark, tmpDir("graft-hist4"))
    e.ingestLines(Seq(
      "hs,host=a v=-50 1700000000000000000",
      "hs,host=a v=0 1700000001000000000",
      "hs,host=a v=50 1700000002000000000"))
    e.histogramRollup()
    val r = e.approxQuantiles("hs", "v", "2023-11-14", "2023-11-14",
      Seq(0.01, 0.5, 0.99)).collect()
    assert(math.abs(r(0).getDouble(1) + 50.0) <= 0.5, "p1 ≈ -50")
    assert(r(1).getDouble(1) == 0.0, "median is the exact-zero bin")
    assert(math.abs(r(2).getDouble(1) - 50.0) <= 0.5, "p99 ≈ +50")
  }

  test("dropSeries removes the series' histogram; empty range is empty") {
    val e = new Engine(spark, tmpDir("graft-hist5"))
    e.ingestLines(Seq(
      "ha,host=a v=1 1700000000000000000",
      "hb,host=a v=2 1700000000000000000"))
    e.histogramRollup()
    assert(e.approxQuantiles("ha", "v", "2023-11-14", "2023-11-14")
      .count() == 3)
    assert(e.dropSeries("ha"))
    assert(e.approxQuantiles("ha", "v", "2023-11-14", "2023-11-14")
      .count() == 0, "dropped series answers empty, not stale")
    assert(e.approxQuantiles("hb", "v", "2023-11-14", "2023-11-14")
      .count() == 3, "other series unaffected")
    assert(e.approxQuantiles("hb", "v", "1999-01-01", "1999-01-02")
      .count() == 0, "empty day range → empty frame (D4 posture)")
  }
}
