package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property pin for q_skew_profile: the count-of-counts Gini and the
  * partial top-k walk recomputed by a NAIVE in-test implementation
  * (sort every key's count, textbook rank-weighted sum), so the
  * domain-decomposed formulation can't drift from the definition. */
class SkewProfileSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_skew_profile equals a naive per-key Gini / top-share " +
      "computation, and the two profiled keys rank as expected " +
      "(event_type is far more concentrated than user_id)") {
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("user_id").cast("string"), col("event_type"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    def naive(keys: Seq[String]): (Long, Long, Long, Long, Long, Long) = {
      val counts = keys.groupBy(identity).values.map(_.length.toLong)
        .toSeq.sorted
      val n = counts.length.toLong
      val t = counts.sum
      val s = counts.zipWithIndex.map { case (c, i) => c * (i + 1L) }.sum
      val gini = (2 * s - (n + 1) * t) * 1000000L / (n * t)
      val top1 = counts.max * 1000000L / t
      val top10 = counts.sorted.reverse.take(10).sum * 1000000L / t
      (n, t, counts.max, top1, top10, gini)
    }
    val expected = Seq(
      "event_type" -> naive(ev.map(_._2).toSeq),
      "user_id" -> naive(ev.map(_._1).toSeq))
    val got = graft.SparkEntry.queries("q_skew_profile")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toSeq
    assert(got == expected)
    val m = got.toMap
    // sanity of the advisory: 5 event types over thousands of rows is
    // the key you must NOT shuffle raw; user_id spreads fine
    assert(m("event_type")._4 > m("user_id")._4,
      "event_type top-1 share should dominate user_id's")
    assert(m("event_type")._1 < 10L &&
      m("user_id")._1 > m("event_type")._1,
      "key cardinalities lost their expected shape")
    assert(got.forall(r => r._2._6 >= 0L && r._2._6 <= 1000000L),
      "Gini out of [0, 1]")
  }
}
