package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Gates for the Z-order layout: the interleave against a bit-by-bit
  * reference, the cover's superset contract on random boxes, and THE
  * POINT — the box scan partition-prunes to the covering z-buckets
  * (fewer files listed than the full layout) while returning exactly
  * the plain filter's rows. */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("morton interleave matches the bit-by-bit reference (Column, " +
      "driver, and generated SQL are one definition)") {
    def slow(x: Long, y: Long): Long =
      (0 until 32).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val cases = for {
      i <- 1 to 200
      g = Gen.choose(0L, 0xFFFFFFFFL)
    } yield (g.pureApply(Gen.Parameters.default, Seed(i.toLong)),
      g.pureApply(Gen.Parameters.default, Seed(1000L + i)))
    cases.foreach { case (x, y) =>
      assert(ZOrder.mortonRef(x, y) == slow(x, y), s"ref diverges at ($x,$y)")
    }
    // the Column expression computes the same keys as the driver ref
    val df = cases.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.morton(col("x"), col("y")).as("z"))
      .collect()
    df.foreach { r =>
      assert(r.getLong(2) == ZOrder.mortonRef(r.getLong(0), r.getLong(1)))
    }
  }

  test("coverBuckets is a superset of every cell the box touches and " +
      "only contains buckets whose tile intersects it") {
    (1 to 50).foreach { i =>
      def pick(seed: Long, lo: Long, hi: Long): Long =
        Gen.choose(lo, hi).pureApply(Gen.Parameters.default, Seed(seed))
      val (xw, yw) = (pick(i, 1, 40), pick(100 + i, 1, 40))
      val x0 = pick(200 + i, 0, 2000); val x1 = x0 + pick(300 + i, 0, 500)
      val y0 = pick(400 + i, 0, 2000); val y1 = y0 + pick(500 + i, 0, 500)
      val cover = ZOrder.coverBuckets(x0, x1, y0, y1, xw, yw).toSet
      // every raw point in the box maps into a covered bucket
      for (x <- x0 to math.min(x1, x0 + 60);
           y <- y0 to math.min(y1, y0 + 60)) {
        val xb = math.min(ZOrder.CoordMax, x / xw)
        val yb = math.min(ZOrder.CoordMax, y / yw)
        val b = ZOrder.mortonRef(xb, yb) >> ZOrder.BucketShift
        assert(cover.contains(b), s"seed $i: box point ($x,$y) in " +
          s"uncovered bucket $b (widths $xw,$yw)")
      }
    }
  }

  test("the box scan partition-prunes to the covering buckets and " +
      "returns exactly the plain filter's rows") {
    val dir = "/root/testdata/sf0.001"
    val q = ZOrder.boxScan(spark, dir, 20L, 60L, 2L, 5L)
    // equivalence: exactly the plain filter over the raw table
    val got = q.select(col("l_orderkey"), col("l_partkey"),
        col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val want = graft.Tables.load(spark, dir, "lineitem")
      .filter(col("l_partkey").between(20, 60) &&
        col("l_suppkey").between(2, 5))
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == want, s"layout path diverges: ${got.length} vs " +
      s"${want.length} rows")
    assert(want.nonEmpty, "vacuity: the box must match rows")
    // plan shape: the layout scan carries a zbucket partition filter
    // and lists FEWER partition dirs than the full layout holds
    val scans = q.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no file scan in the layout path")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"bucket cover did not become partition filters:\n$scan")
    val pType = scan.relation.partitionSchema.fields(0).dataType
    val selected = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.values.get(0, pType).toString.toLong).distinct
    val total = ZOrder.lineitemLayout(spark, dir)._1
      .select(col("zbucket")).distinct().count()
    assert(selected.length < total,
      s"no pruning: ${selected.length} of $total buckets read")
    // and every listed bucket is in the enumerated cover
    val (_, xw, yw) = ZOrder.lineitemLayout(spark, dir)
    val cover = ZOrder.coverBuckets(20, 60, 2, 5, xw, yw).toSet
    assert(selected.forall(cover.contains),
      s"scan read a bucket outside the cover: $selected vs $cover")
  }
}
