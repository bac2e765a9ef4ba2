package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The constant-memory recurrence fold (round-8 VERDICT #4) must be
  * BIT-identical to the collect_list+aggregate() formulation it
  * replaces — same seed, same step, same (ts, event_id, value) order —
  * while holding O(1) state per series. */
class SeriesFoldSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ewmaRecurrence == ewmaRecurrenceArrayFold on the fixture (exact)") {
    val a = graft.queries.TimeseriesQueries.ewmaRecurrence(spark, dir)
      .collect().toSeq
    val b = graft.queries.TimeseriesQueries
      .ewmaRecurrenceArrayFold(spark, dir).collect().toSeq
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("holtWinters == holtWintersArrayFold on the fixture (exact)") {
    val a = graft.queries.TimeseriesQueries.holtWinters(spark, dir)
      .collect().toSeq
    val b = graft.queries.TimeseriesQueries.holtWintersArrayFold(spark, dir)
      .collect().toSeq
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("one long series folds constant-memory and matches the array fold") {
    // one 200k-point series + two short ones, written as parquet so both
    // formulations read the identical source; values vary enough that any
    // ordering or seeding slip would change the fixpoint
    val d = tmpDir("seriesfold")
    spark.range(200000).select(
      col("id").as("event_id"),
      timestamp_seconds(lit(1700000000L) + col("id")).as("ts"),
      when(col("id") < 100000L, 7L).otherwise(col("id") % 2 + 8L)
        .as("user_id"),
      (sin(col("id").cast("double")) * 100.0 + col("id") % 13).as("value"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")

    def byFold = graft.operators.SeriesFold.fold(
      spark.read.parquet(s"$d/events.parquet"),
      "user_id", Seq("ts", "event_id"), "value", Seq("ewma_raw"),
      seed = v => Array(v),
      step = (acc, x) => Array(0.3d * x + 0.7d * acc(0)))
      .orderBy(col("user_id"))
    def byArray = spark.read.parquet(s"$d/events.parquet")
      .groupBy(col("user_id"))
      .agg(expr("transform(sort_array(collect_list(struct(ts, event_id, " +
        "value))), p -> p.value)").as("vals"),
        count(lit(1)).as("n_points"))
      .select(col("user_id"), col("n_points"),
        expr("""aggregate(slice(vals, 2, size(vals) - 1),
          |  element_at(vals, 1),
          |  (acc, x) -> 0.3D * x + 0.7D * acc)""".stripMargin)
          .as("ewma_raw"))
      .orderBy(col("user_id"))

    val got = byFold.collect().toSeq
    assert(got.map(_.getLong(0)) == Seq(7L, 8L, 9L))
    assert(got.head.getLong(1) == 100000L)
    assert(got == byArray.collect().toSeq)
  }

  test("NULL keys form their own group and never merge into key 0") {
    // an InternalRow getLong on a null field silently reads 0 — so a
    // fold that ignores nullity would merge the null-key series into the
    // real key-0 series (or emit two rows both claiming key 0). The
    // groupBy formulation this operator replaces keeps a distinct null
    // group; so must the fold.
    val d = tmpDir("seriesfold-null")
    spark.range(30).select(
      col("id").as("event_id"),
      timestamp_seconds(lit(1700000000L) + col("id")).as("ts"),
      when(col("id") % 3 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 3 - 1).as("user_id"), // keys: null, 0, 1
      col("id").cast("double").as("value"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val src = spark.read.parquet(s"$d/events.parquet")

    val got = graft.operators.SeriesFold.fold(
      src, "user_id", Seq("ts", "event_id"), "value", Seq("last"),
      seed = v => Array(v),
      step = (_, x) => Array(x))
      .collect().toSeq
    assert(got.size == 3, s"expected null/0/1 groups, got $got")
    val byKey = got.map(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getLong(1))
      .toMap
    assert(byKey == Map(None -> 10L, Some(0L) -> 10L, Some(1L) -> 10L))
    // the "last value" state proves rows were routed to the right group:
    // ids ≡ 0 (null), ≡ 1 (key 0), ≡ 2 (key 1) mod 3, max id 29/28/29
    val lastByKey = got.map(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        r.getDouble(2)).toMap
    assert(lastByKey == Map(None -> 27.0, Some(0L) -> 28.0,
      Some(1L) -> 29.0))
  }

  test("the streaming fold plan has no per-key history aggregate") {
    val plan = graft.queries.TimeseriesQueries.ewmaRecurrence(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), plan)
    // the fold output enters the plan as an RDD scan (the InternalRow
    // pass happens behind toRdd), not as an aggregate over histories
    assert(plan.contains("ExistingRDD"), plan)
  }
}
