package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: execute one registered query on a data dir and
  * print its EXECUTED physical plan (post-AQE where it applies).
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
    val Array(name, dir) = args.take(2)
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println("=== EXECUTED ===")
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
