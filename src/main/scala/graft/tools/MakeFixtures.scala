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
    val spark = Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cb = PqIndex.train(emb)
    PqIndex.save(spark, cb, Fixtures.pqCodebooks)
    println(s"wrote ${Fixtures.pqCodebooks}: m=${cb.m} k=${cb.k} subDim=${cb.subDim}")
    // SemDeDup coarse clusters: k=8 spherical k-means over the same
    // embeddings; the stored L2 norm is what both engines divide by
    val cents = AnnIndex.train(emb, k = 8, iters = 5)
    import spark.implicits._
    val rows = cents.zipWithIndex.map { case (c, i) =>
      (i, c.toSeq, math.sqrt(c.map(x => x * x).sum))
    }.toSeq.toDF("cid", "centroid", "cnrm")
    FixtureIO.writeSingleParquet(spark, rows, Fixtures.semdedupCentroids)
    println(s"wrote ${Fixtures.semdedupCentroids}: k=${cents.length}")
    spark.stop()
  }
}
