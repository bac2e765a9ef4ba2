package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffling both fact tables on the join key at write time
  * means the join itself needs NO exchange — the shuffle is paid once at
  * ingest instead of per-query. This is the co-located-join lever for the
  * repeated fact-fact joins (orders ⋈ lineitem) at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val wh = tmpDir("graft-bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val dir = "/root/testdata/sf0.001"

    Tables.load(spark, dir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.load(spark, dir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"join still shuffles on the bucketed key:\n$plan")

    // and the result matches the unbucketed join
    val expect = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("engine.compactBucketed: self-join on the bucketed key plans " +
      "without a shuffle exchange") {
    val engine = new graft.engine.Engine(spark, tmpDir("graft-bwh"))
    (1 to 4).foreach { i =>
      engine.ingestLines(Seq(
        s"cpu,host=h$i usage=0.$i,idle=0.${9 - i} 170000000${i}000000000",
        s"mem,host=h$i used=$i.0 170000000${i}000000000"))
    }
    engine.compactBucketed("m_bucketed", key = "series", buckets = 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val b = spark.table("m_bucketed")
      val usage = b.filter(col("name") === "usage")
        .select(col("series"), col("value").as("u"))
      val idle = b.filter(col("name") === "idle")
        .select(col("series"), col("value").as("i"))
      val joined = usage.join(idle, Seq("series"))
        .groupBy(col("series")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(series"),
        s"bucketed self-join still shuffles on series:\n$plan")
      // 4 usage x 4 idle rows, all series=cpu -> 16 pairs
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == Seq(("cpu", 16L)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS m_bucketed")
    }
  }

  test("streaming ingest hands off to the bucketed table automatically " +
      "(bucketEveryBatches) and compaction keeps batch dirs bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val engine = new graft.engine.Engine(spark, tmpDir("graft-sbwh"))
    val in = MemoryStream[String]
    val q = engine.ingestStream(in.toDF().toDF("value"),
      tmpDir("graft-sbwh-ckpt"),
      compactEveryBatches = 2, maxBatchDirs = 1,
      bucketEveryBatches = 2, bucketTable = "m_stream_bucketed")
    try {
      (1 to 4).foreach { i =>
        in.addData(
          s"cpu,host=h$i usage=0.$i 170000000${i}000000000",
          s"cpu,host=h$i idle=0.${9 - i} 170000000${i}000000000")
        q.processAllAvailable()
      }
      // the periodic hook compacted (batch dirs bounded, data intact) ...
      assert(engine.batchDirCount() <= 2,
        s"batch dirs unbounded: ${engine.batchDirCount()}")
      assert(engine.table().count() == 8)
      // ... and rewrote the bucketed table, so a keyed self-join on the
      // LIVE ingested data plans with no exchange
      assert(spark.catalog.tableExists("m_stream_bucketed"))
      val prevThreshold =
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val b = spark.table("m_stream_bucketed")
        val usage = b.filter(col("name") === "usage")
          .select(col("series"), col("value").as("u"))
        val idle = b.filter(col("name") === "idle")
          .select(col("series"), col("value").as("i"))
        val joined = usage.join(idle, Seq("series"))
          .groupBy(col("series")).agg(count(lit(1)).as("n"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning(series"),
          s"streamed bucketed self-join still shuffles on series:\n$plan")
        val got = joined.collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
        // bucketed snapshot is from batch index 2 (3rd micro-batch had
        // id=2): 3 usage x 3 idle rows at that point
        assert(got == Seq(("cpu", 9L)))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS m_stream_bucketed")
    }
  }
}
