package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed PCA (operators.Pca): single-pass moments, deterministic
  * power-iteration components, map-only projection. */
class PcaSpec extends SparkSpec {

  import spark.implicits._

  /** Closed-form fixture: x = a·u1 + b·u2 in d=8 with orthonormal u1, u2
    * and |a| amplitudes ~5× |b| — the principal axes are u1 then u2 by
    * construction. Amplitudes are deterministic (hash-derived), zero-mean
    * by symmetry of the ± pattern. */
  private val d = 8
  private val u1 = Array(0.5, 0.5, 0.5, 0.5, 0.0, 0.0, 0.0, 0.0)
  private val u2 = Array(0.0, 0.0, 0.0, 0.0, 0.5, 0.5, 0.5, 0.5)

  private def fixture(n: Int, parts: Int = 4) = {
    val rows = (0 until n).map { k =>
      val a = 10.0 * (if (k % 2 == 0) 1 else -1) *
        (1.0 + (k * 2654435761L % 97) / 97.0)
      val b = 2.0 * (if (k % 4 < 2) 1 else -1) *
        (1.0 + (k * 48271L % 89) / 89.0)
      Array.tabulate(d)(i => (a * u1(i) + b * u2(i)).toFloat)
    }
    val df = rows.toDF("embedding")
    if (parts > 0) df.repartition(parts) else df
  }

  test("moments: one-pass covariance matches the two-axis construction") {
    val m = Pca.moments(fixture(400), "embedding")
    assert(m.n == 400)
    // mean ~0 by the ± symmetry of the amplitude pattern
    assert(m.mean.forall(x => math.abs(x) < 0.7), m.mean.mkString(","))
    // variance concentrates on the u1 block (dims 0-3) over u2 (4-7)
    val v1 = (0 until 4).map(i => m.cov(i)(i)).sum
    val v2 = (4 until 8).map(i => m.cov(i)(i)).sum
    assert(v1 > 10 * v2, s"v1=$v1 v2=$v2")
    // cross-block covariance ~0 (a and b patterns are uncorrelated)
    assert(math.abs(m.cov(0)(4)) < 1.0)
  }

  test("principalComponents: axes recovered in order, deterministically") {
    val m = Pca.moments(fixture(400), "embedding")
    val pcs = Pca.principalComponents(m.cov, 3)
    val (l1, p1) = pcs(0)
    val (l2, p2) = pcs(1)
    val (l3, _) = pcs(2)
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => a(i) * b(i)).sum
    assert(math.abs(dot(p1, u1)) > 0.999, s"pc1 off-axis: ${p1.mkString(",")}")
    assert(math.abs(dot(p2, u2)) > 0.999, s"pc2 off-axis: ${p2.mkString(",")}")
    assert(l1 > l2 && l2 > l3 * 100, s"eigen order: $l1 $l2 $l3")
    // sign convention: the largest-|coordinate| is positive
    assert(p1(p1.indices.maxBy(i => math.abs(p1(i)))) > 0)
    // variance explained sums ≈ 1 over the true 2D subspace
    val ve = Pca.varianceExplained(m.cov, pcs)
    assert(ve.head + ve(1) > 0.999, ve.toString)
    // a second extraction from the same moments is bit-identical (fixed
    // start vector, fixed iteration count, fixed sign rule)
    val again = Pca.principalComponents(m.cov, 3)
    assert(pcs.zip(again).forall { case ((la, va), (lb, vb)) =>
      la == lb && va.sameElements(vb) })
  }

  test("project: map-only plan (no Exchange), values = centered dots") {
    val df = fixture(100)
    val m = Pca.moments(df, "embedding")
    val pcs = Pca.principalComponents(m.cov, 2)
    // project a PARQUET scan (a local relation constant-folds away): the
    // projection itself must add NOTHING beyond the scan — no Exchange
    // anywhere, dot products inside whole-stage codegen
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val me = Pca.moments(emb, "embedding")
    val out = Pca.project(emb, "embedding",
      Pca.principalComponents(me.cov, 2), me.mean)
    out.collect() // finalize the adaptive plan before inspecting it
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*(1) "), plan) // whole-stage codegen marker
    // values: centered dot, checked on the closed-form fixture
    val row = Pca.project(fixture(100, parts = 0), "embedding", pcs, m.mean)
      .select(col("embedding"), col("pc0")).head()
    val e = row.getSeq[Float](0).map(_.toDouble)
    val expected = e.indices.map(i => (e(i) - m.mean(i)) * pcs.head._2(i)).sum
    assert(math.abs(row.getDouble(1) - expected) < 1e-9)
  }

  test("real embeddings: 64 -> 8 components, variance monotone and " +
      "concentrated vs the isotropic floor") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Pca.moments(emb, "embedding")
    val pcs = Pca.principalComponents(m.cov, 8)
    val ls = pcs.map(_._1)
    assert(ls.zip(ls.tail).forall { case (a, b) => a >= b }, ls.toString)
    // each retained component must beat the average (isotropic) share —
    // otherwise PCA buys nothing over JL on this corpus
    val ve = Pca.varianceExplained(m.cov, pcs)
    assert(ve.head > 1.0 / 64, ve.toString)
    // projected second moments equal the eigenvalues (the PCA contract):
    // E[pc_m²] − E[pc_m]² = λ_m, checked distributed for pc0
    val p = Pca.project(emb, "embedding", pcs.take(1), m.mean)
    val r = p.agg(avg(col("pc0")).as("mu"),
      avg(col("pc0") * col("pc0")).as("m2")).head()
    val varP = r.getDouble(1) - r.getDouble(0) * r.getDouble(0)
    assert(math.abs(varP - ls.head) / ls.head < 1e-6,
      s"var(pc0)=$varP λ1=${ls.head}")
  }
}
