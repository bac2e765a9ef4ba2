package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main (dev loop): print the formatted physical plan of
  * named queries (or every query) at a given sf dir — the
  * ".explain then iterate" discipline without a notebook. Usage:
  * `runMain graft.Explain <sfDir> [query ...]`.
  *
  * Two modes. The DEFAULT executes each query's own QueryExecution
  * (toRdd.foreach, no driver collect) and prints the EXECUTED plan —
  * an unexecuted AdaptiveSparkPlan shows isFinalPlan=false and hides
  * ReusedExchange / coalesced-partition / skew shapes, which is
  * exactly what this audit tool exists to surface. Set
  * SPARK_GRAFT_EXPLAIN_LAZY=1 for the cheap unexecuted FormattedMode
  * print (plan-only sanity on frames too large to run locally).
  * Parallelism follows SPARK_GRAFT_CPUS (default 4) so plan audits at
  * replica scale see the same partitioning the bench does. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val lazyMode = sys.env.get("SPARK_GRAFT_EXPLAIN_LAZY").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try {
          val qe = fn(spark, sfDir).queryExecution
          if (!lazyMode) qe.toRdd.foreach(_ => ()) // finalize AQE
          println(qe.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch { case e: Throwable =>
          println(s"[explain] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
