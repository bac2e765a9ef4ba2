package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Semantics of the native banded-DTW expression. The oracle (q_dtw)
  * pins it against DuckDB's recursive-CTE anti-diagonal DP on real
  * fixture pairs; this spec pins it against an INDEPENDENT definition —
  * a plain full-matrix DP — plus the metric's defining properties, so
  * both engines agreeing on a wrong recurrence would still fail here.
  */
class DtwSpec extends SparkSpec {

  private def native(x: Seq[Long], y: Seq[Long], band: Int): Long =
    DtwOps.dtwBand(ArrayData.toArrayData(x.toArray),
      ArrayData.toArrayData(y.toArray), band)

  /** Independent full-matrix reference DP (no rolling rows, no scratch
    * reuse — deliberately the naive textbook form). */
  private def ref(x: Seq[Long], y: Seq[Long], band: Int): Long = {
    val inf = 1L << 40
    val n = x.length
    val m = y.length
    val d = Array.fill(n, m)(inf)
    for (i <- 0 until n; j <- 0 until m if math.abs(i - j) <= band) {
      val c = math.abs(x(i) - y(j))
      val best =
        if (i == 0 && j == 0) 0L
        else Seq(
          if (i > 0) d(i - 1)(j) else inf,
          if (j > 0) d(i)(j - 1) else inf,
          if (i > 0 && j > 0) d(i - 1)(j - 1) else inf).min
      d(i)(j) = c + best
    }
    d(n - 1)(m - 1)
  }

  test("pinned hand examples") {
    // identical series: zero distance at any band
    assert(native(Seq(1L, 5L, 3L), Seq(1L, 5L, 3L), 1) === 0L)
    // classic shift tolerance: y is x delayed by one step — DTW aligns
    // the shapes and pays only the edge costs, where lock-step L1 pays
    // per-element. x=[0,10,0,0], y=[0,0,10,0]: DTW=0 via the warp path,
    // lock-step sum = 20.
    assert(native(Seq(0L, 10L, 0L, 0L), Seq(0L, 0L, 10L, 0L), 2) === 0L)
    // band too tight to warp: band 0 forces the lock-step diagonal
    assert(native(Seq(0L, 10L, 0L, 0L), Seq(0L, 0L, 10L, 0L), 0) === 20L)
    // single elements: plain |x-y|
    assert(native(Seq(7L), Seq(3L), 4) === 4L)
  }

  test("fail-fast contract: empty input and unalignable lengths throw") {
    intercept[IllegalArgumentException](native(Seq.empty, Seq(1L), 4))
    intercept[IllegalArgumentException](native(Seq(1L), Seq.fill(9)(1L), 4))
  }

  test("matches the independent full-matrix DP on random series " +
      "(including unequal lengths within the band)") {
    val series = Gen.choose(1, 24).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100000L, 100000L)))
    val cases = Gen.zip(series, series, Gen.choose(0, 6))
    for (i <- 0 until 300) {
      val (x, y, extraBand) =
        cases.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val band = math.abs(x.length - y.length) + extraBand
      assert(native(x, y, band) === ref(x, y, band),
        s"seed $i: x=$x y=$y band=$band")
    }
  }

  test("metric sanity: symmetric, and wider bands never increase the " +
      "distance") {
    val series = Gen.listOfN(12, Gen.choose(-1000L, 1000L))
    val cases = Gen.zip(series, series)
    for (i <- 0 until 200) {
      val (x, y) = cases.pureApply(Gen.Parameters.default, Seed(1000L + i))
      assert(native(x, y, 3) === native(y, x, 3))
      assert(native(x, y, 6) <= native(x, y, 3))
    }
  }

  test("SQL surface: dtw_band resolves with a literal band and rejects " +
      "a non-literal one") {
    DtwOps.register(spark)
    val r = spark.sql("SELECT dtw_band(array(0L,10L,0L,0L), " +
      "array(0L,0L,10L,0L), 2) AS d").head.getLong(0)
    assert(r === 0L)
    intercept[Exception](spark.sql(
      "SELECT dtw_band(array(1L), array(1L), cast(rand()*4 AS INT))")
      .collect())
  }

  test("q_dtw plan uses the native dtw_band expression (no lambda " +
      "tower in the pair stage) and returns deterministic top pairs") {
    val df = graft.SparkEntry.queries("q_dtw")(spark,
      "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dtw_band"),
      s"native dtw_band missing from plan:\n${plan.take(3000)}")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // ranked ascending: DTW distance is the similarity readout
    val dists = rows.map(_.getLong(2))
    assert(dists.sameElements(dists.sorted))
  }
}
