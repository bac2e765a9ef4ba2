package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Fixtures, Tables}
import graft.operators.PqIndex

/** One-shot fixture generator (run via `sbt "runMain graft.tools.MakeFixtures"`,
  * output committed): trains the PQ codebooks on the sf0.01 embeddings with
  * the deterministic [[PqIndex.train]] sampler and pins them to
  * [[Fixtures.pqCodebooks]]. Pinning makes the codebooks DATA instead of
  * driver state, which is what lets the q34e_pq_ann DuckDB oracle re-derive
  * encode + ADC scoring as static SQL (round-5 VERDICT item #1).
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
    val cb = PqIndex.train(Tables.load(spark, sfDir, "embeddings"))
    PqIndex.save(spark, cb, Fixtures.pqCodebooks)
    println(s"wrote ${Fixtures.pqCodebooks}: m=${cb.m} k=${cb.k} subDim=${cb.subDim}")
    spark.stop()
  }
}
