package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Fixtures, Tables}
import graft.operators.{AnnIndex, PqIndex}

/** One-shot fixture generator (run via `sbt "runMain graft.tools.MakeFixtures"`,
  * output committed): trains the PQ codebooks and the SemDeDup k-means
  * centroids on the sf0.01 embeddings with the deterministic samplers and
  * pins them to [[Fixtures]]. Pinning makes the models DATA instead of
  * driver state, which is what lets the q34e_pq_ann / q_dedup_semdedup
  * DuckDB oracles re-derive encode/assignment as static SQL (round-5
  * VERDICT item #1 pattern).
  */
object MakeFixtures {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // which fixtures to (re)write — committed fixtures are pinned data,
    // so a later-round addition must NOT silently retrain the earlier
    // ones (oracle queries hash against the committed bytes)
    val what = args.lift(1).getOrElse("all")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, sfDir, "embeddings")
    import spark.implicits._
    if (what == "all" || what == "pq") {
      val cb = PqIndex.train(emb)
      PqIndex.save(spark, cb, Fixtures.pqCodebooks)
      println(s"wrote ${Fixtures.pqCodebooks}: m=${cb.m} k=${cb.k} subDim=${cb.subDim}")
    }
    if (what == "all" || what == "semdedup") {
      // SemDeDup coarse clusters: k=8 spherical k-means over the same
      // embeddings; the stored L2 norm is what both engines divide by
      val cents = AnnIndex.train(emb, k = 8, iters = 5)
      val rows = cents.zipWithIndex.map { case (c, i) =>
        (i, c.toSeq, math.sqrt(c.map(x => x * x).sum))
      }.toSeq.toDF("cid", "centroid", "cnrm")
      FixtureIO.writeSingleParquet(spark, rows, Fixtures.semdedupCentroids)
      println(s"wrote ${Fixtures.semdedupCentroids}: k=${cents.length}")
    }
    if (what == "all" || what == "pca") {
      // top-4 principal components of the same corpus (deterministic
      // power iteration, sign-normalized — graft.operators.Pca); center
      // is the Σ u_i·mean_i scalar Pca.project subtracts, stored so the
      // DuckDB oracle never re-derives the mean
      import graft.operators.Pca
      val mo = Pca.moments(emb, "embedding")
      val pcs = Pca.principalComponents(mo.cov, 4)
      val rows = pcs.zipWithIndex.map { case ((lambda, u), m) =>
        val center = u.indices.iterator.map(i => u(i) * mo.mean(i)).sum
        (m, u.toSeq, center, lambda)
      }.toDF("m", "component", "center", "eigenvalue")
      FixtureIO.writeSingleParquet(spark, rows, Fixtures.pcaComponents)
      println(s"wrote ${Fixtures.pcaComponents}: k=${pcs.length} " +
        s"lambdas=${pcs.map(_._1).mkString(",")}")
    }
    spark.stop()
  }
}
