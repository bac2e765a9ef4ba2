package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The IVM contract: store ⊎ delta ≡ recompute, the store is built
  * once and REUSED (that's the entire point — the refresh never
  * rescans the base), and the refresh plan proves it structurally. */
class IncrementalRollupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def storeDir: java.io.File = {
    val src = new java.io.File(s"$dir/orders.parquet")
    val key = Integer.toHexString(scala.util.hashing.MurmurHash3
      .stringHash(s"${src.getCanonicalPath}@${src.lastModified}"))
    new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_ivm/nation_rev_$key")
  }

  test("incremental rollup equals the full recompute exactly") {
    val inc = IncrementalRollup.nationRevenue(spark, dir)
      .collect().map(_.toSeq.toList).toSeq
    val o = graft.Tables.load(spark, dir, "orders")
    val c = graft.Tables.load(spark, dir, "customer")
    val n = graft.Tables.load(spark, dir, "nation")
    val full = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"))
      .collect().map(_.toSeq.toList).toSeq
    assert(inc == full)
    assert(inc.nonEmpty)
  }

  test("the store is built once and reused; the refresh plan reads the " +
      "store, and its only orders scan is the delta slice") {
    IncrementalRollup.nationRevenue(spark, dir).collect() // ensure built
    val d = storeDir
    assert(d.exists, s"store not materialized at $d")
    val mtime = d.lastModified
    val df = IncrementalRollup.nationRevenue(spark, dir)
    df.collect()
    assert(d.lastModified == mtime, "second refresh rebuilt the store")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_ivm"),
      s"refresh plan does not read the persisted store:\n${plan.take(2000)}")
    // the delta branch filters orders on the slice predicate — the
    // base 9/10ths is never rescanned at refresh time
    assert(plan.contains("pmod") || plan.contains("% 10"),
      s"no delta slice filter in refresh plan:\n${plan.take(2000)}")
  }
}
