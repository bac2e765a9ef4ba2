package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: execute one registered query on a data dir and
  * print its EXECUTED physical plan (post-AQE: the df is executed through
  * its OWN QueryExecution, so the printed AdaptiveSparkPlan is the final
  * one — a separate noop-write action would execute a different
  * QueryExecution and leave this one's plan at isFinalPlan=false,
  * hiding exactly the runtime shapes — ReusedExchange, coalesced
  * partitions, skew splits — the tool exists to audit).
  *
  * Usage: `sbt "runMain graft.Explain <query> <dir>"` — e.g. over
  * `/root/testdata/sf0.1` or a ScaleBench replica dir, to check a
  * shape at the scale where it actually matters (the q18b and
  * levenshtein-blocked plan audits in SCALE.md §9.3–9.4 came from
  * exactly this loop: explain at 30×, find the second scan, fix,
  * re-explain).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Explain <query-name> <data-dir>")
      sys.exit(2)
    }
    val (name, dir) = (args(0), args(1))
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name, {
      System.err.println(s"unknown query '$name'; choose from:\n  " +
        SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      sys.exit(2)
    })
    val df = fn(spark, dir)
    // execute THIS QueryExecution (df.foreach/df.rdd would build a
    // separate deserializing QueryExecution and leave this plan's AQE
    // unfinalized — verified: it prints isFinalPlan=false)
    df.queryExecution.toRdd.foreach(_ => ())
    println("=== EXECUTED ===")
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
