package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The opt-in COUNT(DISTINCT) → HLL rewrite must fire only when enabled,
  * keep the estimate within the sketch's error bound, and leave
  * non-sketchable types exact.
  */
class ApproxDistinctRuleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("count(distinct) rewrites to an HLL sketch estimate within its " +
      "error bound, grouped and global, opt-in only") {
    val exactGlobal = Tables.load(spark, dir, "events")
      .agg(countDistinct(col("user_id"))).head().getLong(0)

    withExtendedSession { ext =>
      def q() = Tables.load(ext, dir, "events")
        .agg(countDistinct(col("user_id")).as("n"))
      // conf off: exact plan, no sketch
      assert(!q().queryExecution.optimizedPlan.toString.contains("hll_sketch"))
      assert(q().head().getLong(0) == exactGlobal)

      ext.conf.set(ApproxCountDistinctRule.EnabledConf, "true")
      val plan = q().queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("hll_sketch"), s"rewrite did not fire:\n$plan")
      val est = q().head().getLong(0)
      // lgK=12 → ~1.6% relative standard error; allow 5%
      assert(math.abs(est - exactGlobal).toDouble / exactGlobal < 0.05,
        s"estimate $est vs exact $exactGlobal")

      // grouped: per-group estimates, all within bound
      val exactByType = Tables.load(spark, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val estByType = Tables.load(ext, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(estByType.keySet == exactByType.keySet)
      estByType.foreach { case (k, v) =>
        assert(math.abs(v - exactByType(k)).toDouble / exactByType(k) < 0.05,
          s"$k: $v vs ${exactByType(k)}")
      }

      // non-sketchable type (double): left exact
      val dq = Tables.load(ext, dir, "events")
        .agg(countDistinct(col("value")).as("n"))
      assert(!dq.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("hll_sketch"))
      assert(dq.head().getLong(0) == Tables.load(spark, dir, "events")
        .agg(countDistinct(col("value"))).head().getLong(0))

      // empty input: COUNT(DISTINCT) contract is 0, never NULL — the
      // rewrite wraps the estimate in coalesce(.., 0L) (round-5 ADVICE)
      val empty = Tables.load(ext, dir, "events")
        .filter(col("event_type") === "no_such_type")
        .agg(countDistinct(col("user_id")).as("n"))
      assert(empty.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("hll_sketch"))
      val row = empty.head()
      assert(!row.isNullAt(0) && row.getLong(0) == 0L,
        s"empty-input COUNT(DISTINCT) must be 0, got ${row.get(0)}")
    }
  }
}
