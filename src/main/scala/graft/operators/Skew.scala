package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives (SURVEY §7.6-5 / builder contract "salting for
  * skew"). AQE's skew-join handling covers sort-merge joins at runtime;
  * these cover the two shapes AQE does not: hot GROUP BY keys and hot
  * broadcast-unfriendly join keys.
  *
  * Both are pure plan rewrites — results are identical to the unsalted
  * plan (asserted in SkewSpec), only the shuffle key cardinality changes.
  */
object Skew {

  /** Two-phase aggregation for skewed group keys: a deterministic salt
    * (hash of the whole row, NOT rand() — reruns must agree) splits each
    * hot key across `buckets` reducers for the partial phase; the final
    * phase merges the per-salt partials. sum/count/min/max re-aggregate
    * losslessly.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("psum"), count(lit(1)).as("pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("psum")).as("sum"), sum(col("pcnt")).as("cnt"))
  }

  /** Salted equi-join for a skewed fact key against a dimension too large
    * to broadcast: fact rows get a deterministic salt in [0, buckets); the
    * dimension is replicated `buckets` times with explode(sequence(...)),
    * so each (key, salt) shuffle partition holds 1/buckets of the hot key.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }
}
