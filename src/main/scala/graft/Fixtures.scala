package graft

/** Repo-committed fixture files: single parquet FILES (not directories) so
  * both Spark (`spark.read.parquet`) and the driver's DuckDB oracle
  * (`read_parquet('<abs path>')`) read the same bytes at the same absolute
  * path. Oracle SQL strings are built at Verify time, so they interpolate
  * these resolved paths.
  */
object Fixtures {
  /** fixtures/ resolved against the CWD when present (sbt runs from the
    * repo root), with the driver's canonical checkout as fallback. */
  val dir: String = {
    val local = new java.io.File("fixtures")
    if (local.isDirectory) local.getAbsolutePath else "/root/repo/fixtures"
  }

  /** Trained PQ codebooks for q34e_pq_ann (written once by
    * [[graft.tools.MakeFixtures]], committed): one row per (mi, ki) with
    * the centroid as DOUBLE[] and half_nc2 = 0.5*||centroid||^2 precomputed
    * with the same sequential Scala arithmetic the Spark encode expression
    * uses — the oracle reads the stored value instead of re-deriving it. */
  def pqCodebooks: String = s"$dir/pq_codebooks.parquet"

  /** Spherical k-means centroids for q_dedup_semdedup (written once by
    * [[graft.tools.MakeFixtures]], committed): one row per cluster with
    * the centroid as DOUBLE[] and its L2 norm precomputed at save time —
    * both engines read the STORED norm, so the assignment denominator is
    * the same value by construction, not by matched re-derivation. */
  def semdedupCentroids: String = s"$dir/semdedup_centroids.parquet"

  /** Principal components for q_pca_project (written once by
    * [[graft.tools.MakeFixtures]], committed): one row per component m
    * with the eigenvector as DOUBLE[], its eigenvalue, and the scalar
    * centering term `center = Σ_i u_i·mean_i` precomputed at save time
    * with the same sequential Scala sum [[graft.operators.Pca]].project
    * subtracts — both engines SUBTRACT THE STORED VALUE, so the only
    * cross-engine arithmetic in the query is the dot product (the
    * vec_dot / list_sum canon q34 already certifies). */
  def pcaComponents: String = s"$dir/pca_components.parquet"
}
