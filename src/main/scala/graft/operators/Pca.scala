package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the data-dependent
  * complement to q_embed_project's data-oblivious JL sign matrix: where
  * the random projection pays ~1/sqrt(k) distortion on every direction
  * equally, PCA spends the same k output dims on the directions the
  * corpus actually varies in (dimensionality reduction before ANN /
  * clustering / SemDeDup when embeddings have anisotropic structure —
  * which trained text encoders overwhelmingly do).
  *
  * Scale shape (the 100 TB grade):
  *  - MOMENTS: one `treeAggregate` pass over the data accumulating the
  *    d×d second-moment matrix + mean (d² + d doubles per partition,
  *    merged pairwise up a 2-level tree — executor-count-independent
  *    driver load). The result is MODEL-sized; no row ever leaves its
  *    partition. This is the same single-pass shape as
  *    mllib's RowMatrix.computeCovariance, reimplemented here because
  *    (a) the mllib path routes through Breeze SVD whose eigenvector
  *    SIGNS are solver-internal (non-deterministic across versions), and
  *    (b) we want the raw second-moment form to stay numerically exact
  *    for the spec's closed-form fixtures.
  *  - EIGEN: power iteration + deflation on the driver-side d×d matrix —
  *    O(k·iters·d²) driver flops on a model-sized object (for d=64:
  *    microseconds). Deterministic: fixed start vector, fixed iteration
  *    count, sign normalized so the largest-|coordinate| is positive.
  *  - PROJECT: map-only — each output coordinate is a native codegen'd
  *    `vec_dot` against a broadcast component literal minus a constant
  *    (the centering term), so projection stacks onto any scan for free
  *    and never shuffles.
  */
object Pca {

  /** Covariance + mean + count of an ARRAY<FLOAT>/ARRAY<DOUBLE> column,
    * in ONE pass. Rows with null/empty vectors are skipped. */
  def moments(df: DataFrame, embCol: String): Moments = {
    val rows = df.select(col(embCol)).na.drop().rdd
      .map(_.getSeq[Any](0).map {
        case f: Float  => f.toDouble
        case d: Double => d
        case x         => x.toString.toDouble
      }.toArray)
    // acc layout: [n, sum_0..d-1, upper-triangle row-major sums]
    val agg = rows.treeAggregate(null: Array[Double])(
      seqOp = (acc0, x) => {
        val d = x.length
        val acc = if (acc0 != null) acc0
          else new Array[Double](1 + d + d * (d + 1) / 2)
        acc(0) += 1
        var i = 0
        var t = 1 + d
        while (i < d) {
          acc(1 + i) += x(i)
          var j = i
          while (j < d) { acc(t) += x(i) * x(j); t += 1; j += 1 }
          i += 1
        }
        acc
      },
      combOp = (a, b) =>
        if (a == null) b else if (b == null) a
        else { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
      depth = 2)
    require(agg != null && agg(0) > 0, "moments: no non-null vectors")
    val n = agg(0)
    val d = (math.sqrt(8.0 * (agg.length - 1) + 9) - 3).toInt / 2 match {
      case dd if 1 + dd + dd * (dd + 1) / 2 == agg.length => dd
      case _ => throw new IllegalStateException("moments: bad acc length")
    }
    val mean = Array.tabulate(d)(i => agg(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var t = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = agg(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    Moments(cov, mean, n.toLong)
  }

  final case class Moments(cov: Array[Array[Double]], mean: Array[Double],
      n: Long)

  /** Top-k (eigenvalue, eigenvector) pairs of a symmetric matrix by
    * deterministic power iteration with deflation. Components come out
    * eigenvalue-DESCENDING; each vector's largest-|coordinate| is made
    * positive (ties toward the lower index), so two runs — or two
    * clusters — produce identical components. */
  def principalComponents(cov: Array[Array[Double]], k: Int,
      iters: Int = 300): Seq[(Double, Array[Double])] = {
    val d = cov.length
    val comps = scala.collection.mutable.ArrayBuffer.empty[(Double, Array[Double])]
    for (_ <- 0 until math.min(k, d)) {
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      var it = 0
      while (it < iters) {
        val w = multiplyDeflated(cov, comps.toSeq, v)
        val nrm = math.sqrt(w.map(x => x * x).sum)
        v = if (nrm > 0) w.map(_ / nrm) else w
        it += 1
      }
      val cv = multiplyDeflated(cov, comps.toSeq, v)
      val lambda = v.indices.iterator.map(i => v(i) * cv(i)).sum
      // sign convention: largest-|coordinate| positive, first index wins
      val mi = v.indices.maxBy(i => (math.abs(v(i)), -i))
      val s = if (v(mi) < 0) -1.0 else 1.0
      comps += ((lambda, v.map(_ * s)))
    }
    comps.toSeq
  }

  private def multiplyDeflated(cov: Array[Array[Double]],
      done: Seq[(Double, Array[Double])], v: Array[Double]): Array[Double] = {
    val d = cov.length
    val w = new Array[Double](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      while (j < d) { s += cov(i)(j) * v(j); j += 1 }
      w(i) = s
      i += 1
    }
    // subtract λ_m u_m (u_mᵀ v) for each already-extracted component
    done.foreach { case (lm, um) =>
      var uv = 0.0
      var j = 0
      while (j < d) { uv += um(j) * v(j); j += 1 }
      var j2 = 0
      while (j2 < d) { w(j2) -= lm * um(j2) * uv; j2 += 1 }
    }
    w
  }

  /** Append centered projections `pc0..pc{k-1}` — map-only: one native
    * vec_dot against a component literal minus the constant centering
    * term per output coordinate. */
  def project(df: DataFrame, embCol: String,
      pcs: Seq[(Double, Array[Double])], mean: Array[Double]): DataFrame = {
    val cols: Seq[Column] = pcs.zipWithIndex.map { case ((_, u), m) =>
      val center = u.indices.iterator.map(i => u(i) * mean(i)).sum
      (graft.functions.VecOps.vec_dot(col(embCol), typedLit(u.toSeq)) -
        lit(center)).as(s"pc$m")
    }
    df.select(df.columns.map(col).toSeq ++ cols: _*)
  }

  /** Fraction of total variance captured per component (λ_m / tr(C)). */
  def varianceExplained(cov: Array[Array[Double]],
      pcs: Seq[(Double, Array[Double])]): Seq[Double] = {
    val tr = cov.indices.map(i => cov(i)(i)).sum
    pcs.map { case (l, _) => l / tr }
  }

  /** Per-row moment TERMS for streaming accumulation: a d-dim vector
    * expands to d(d+1)/2 upper-triangle product terms (i ≤ j), d sum
    * terms (j = -1), and one count term (i = j = -1). A continuous
    * `groupBy(i, j).agg(sum(v))` over these makes Spark's aggregation
    * state store ITSELF the moments summary — d²-bounded state whatever
    * the row count, mergeable by addition, exactly the LogHistogram/HLL
    * rollup contract for second moments. Map-side partial aggregation
    * collapses each partition's fan-out back to ≤ d² rows before any
    * shuffle. Rebuild with [[fromMomentRows]]; the model refreshes from
    * live state at any time (the streaming twin of [[moments]]). */
  def momentTermsExpr(embCol: String): Column = expr(
    s"concat(" +
    s"array(named_struct('i', -1, 'j', -1, 'v', CAST(1.0 AS DOUBLE))), " +
    s"transform(sequence(1, size($embCol)), i -> named_struct(" +
    s"'i', i, 'j', -1, 'v', CAST(element_at($embCol, i) AS DOUBLE))), " +
    s"flatten(transform(sequence(1, size($embCol)), i -> " +
    s"transform(sequence(i, size($embCol)), j -> named_struct(" +
    s"'i', i, 'j', j, 'v', CAST(element_at($embCol, i) AS DOUBLE) * " +
    s"CAST(element_at($embCol, j) AS DOUBLE))))))")

  /** Rebuild [[Moments]] from accumulated (i, j, sum) rows — i/j are
    * 1-based from [[momentTermsExpr]]. */
  def fromMomentRows(rows: Seq[(Int, Int, Double)]): Moments = {
    val n = rows.collectFirst { case (-1, -1, v) => v }
      .getOrElse(throw new IllegalArgumentException("no count term"))
    val sums = rows.collect { case (i, -1, v) if i > 0 => (i - 1, v) }.toMap
    val d = sums.keys.max + 1
    val mean = Array.tabulate(d)(i => sums(i) / n)
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { case (i1, j1, v) =>
      if (i1 > 0 && j1 > 0) {
        val c = v / n - mean(i1 - 1) * mean(j1 - 1)
        cov(i1 - 1)(j1 - 1) = c
        cov(j1 - 1)(i1 - 1) = c
      }
    }
    Moments(cov, mean, n.toLong)
  }
}
