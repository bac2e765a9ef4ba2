package graft

import org.apache.spark.sql.SparkSession

import graft.engine.Engine

/** Ingest throughput: synthetic line-protocol batch through the full
  * parse -> explode -> partitioned-append pipeline (reference E3 path).
  * Prints one JSON line with lines/sec and rows/sec.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nLines = sys.env.getOrElse("SPARK_GRAFT_INGEST_LINES", "200000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wh = java.nio.file.Files.createTempDirectory("graft-ingest-bench")
    val engine = new Engine(spark, wh.toString)
    // 2 fields per line -> 2 rows per line; 8 series; 30 days of event time
    val base = 1700000000000000000L
    val lines = spark.range(nLines).map { i =>
      val day = i % 30
      s"series_${i % 8},host=h${i % 4},dc=dc${i % 2} cpu=${(i % 100) / 100.0},mem=${(i % 47) / 47.0} ${base + day * 86400000000000L + i}"
    }.toDF("value")
    lines.cache()
    lines.count() // materialize the source outside the timed section

    val mode = sys.env.getOrElse("SPARK_GRAFT_INGEST_MODE", "full")
    val t0 = System.nanoTime()
    val parsed = graft.ingest.IngestPipeline.parseLines(spark, lines)
    if (mode == "parse") parsed.write.format("noop").mode("overwrite").save()
    else engine.writeBatch(parsed, "bench") // the REAL production write path
    val sec = (System.nanoTime() - t0) / 1e9

    val rows = engine.table().count()
    println(f"""{"metric":"ingest","lines":$nLines,"rows":$rows,"sec":$sec%.3f,"lines_per_sec":${(nLines / sec).toLong},"rows_per_sec":${(rows / sec).toLong}}""")
    spark.stop()
  }
}
