package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Refresh-cost probe for the SEGMENTED search store (round-15 VERDICT
  * #4's "done" bar): at each corpus multiple K it seeds a fresh engine
  * warehouse with K× the sf0.1 events corpus as string-field documents,
  * builds the BM25 store from scratch (index-sized work — the honest
  * proxy for what the round-15 form ALSO paid per refresh, since its
  * refresh rewrote the whole postings store), then ingests a FIXED
  * 2000-document delta batch and times `refreshSearchIndex()`. The
  * segmented claim is that refresh wall-clock tracks the DELTA —
  * build_sec grows ≈K×, refresh_sec stays ≈flat.
  *
  * Usage: `sbt "runMain graft.SearchRefreshProbe [K ...]"` (default
  * 1 3 10). One JSON line per K:
  * `{"k":K,"n_docs":…,"build_sec":…,"refresh_sec":…,"segments":…}`.
  * Warehouses land under /tmp/graft_searchscale/xK and are rebuilt each
  * run (the measurement IS the build). */
object SearchRefreshProbe {

  private def docRows(ev: DataFrame, shift: Long, namePrefix: String) =
    ev.select(
      col("event_type").as("series"),
      expr("uuid()").as("id"),
      col("ts").as("time"),
      current_timestamp().as("created_at"),
      concat(lit(namePrefix), col("event_id") + lit(shift)).as("name"),
      lit(null).cast("double").as("value"),
      lit(null).cast("long").as("value_long"),
      concat(lit("w"), pmod(col("event_id") + lit(shift), lit(5L)),
        lit(" w"), pmod(col("user_id"), lit(7L)),
        lit(" w"), pmod(col("event_id") + lit(shift), lit(3L)))
        .as("value_str"),
      lit(null).cast("boolean").as("value_bool"),
      map().cast("map<string,string>").as("tags"))

  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 3, 10)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.load(spark, base, "events")
    val evCount = ev.count()
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    for (k <- ks) {
      val wh = s"/tmp/graft_searchscale/x$k"
      val fs = new org.apache.hadoop.fs.Path(wh)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(wh), true)
      val e = new graft.engine.Engine(spark, wh)
      // K× corpus: disjoint event_id ranges (the ScaleBench shift)
      val seed = (0 until k).map(r =>
          docRows(ev, r.toLong * 1000000000L, "d"))
        .reduce(_.unionByName(_))
      e.writeBatch(seed, "b-seed")
      val buildSec = time(e.buildSearchIndex())
      // the FIXED delta: 2000 fresh documents, constant at every K
      val delta = docRows(ev.orderBy(col("event_id")).limit(2000),
        -1000000000L, "x")
      e.writeBatch(delta, "b-delta")
      val refreshSec = time(e.refreshSearchIndex())
      val nSegs = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$wh/search_index/segments"))
        .count(_.isDirectory)
      println(f"""{"k":$k,"n_docs":${evCount * k},""" +
        f""""delta_docs":2000,"build_sec":$buildSec%.2f,""" +
        f""""refresh_sec":$refreshSec%.2f,"segments":$nSegs}""")
      e.releaseWriterLease()
    }
    spark.stop()
  }
}
