package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Z-order clustering must (1) preserve the data exactly and (2) actually
  * shrink per-file min/max spans on EVERY z-dimension at once — the
  * property parquet footer skipping feeds on. A single-column sort gives a
  * tight span on that column and full-range spans on the others; the
  * z-layout must beat it where it is blind.
  */
class ZOrderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  /** Mean per-file (max-min) span of `c`, normalized by the global span —
    * 1.0 means every file covers the whole range (no skipping possible),
    * 1/nFiles is the disjoint ideal. */
  private def meanSpan(path: String, c: String): Double = {
    val perFile = spark.read.parquet(path)
      .withColumn("__f", input_file_name())
      .groupBy(col("__f"))
      .agg((max(col(c).cast("double")) - min(col(c).cast("double")))
        .as("span"))
      .agg(avg(col("span"))).head().getDouble(0)
    val g = spark.read.parquet(path)
      .agg(max(col(c).cast("double")) - min(col(c).cast("double")))
      .head().getDouble(0)
    perFile / g
  }

  test("z-ordered layout bounds per-file stats spans on both dimensions " +
      "and beats the single-column sort's worst dimension") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val nFiles = 16

    val sortedPath = tmpDir("zorder-sorted")
    ev.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(sortedPath)

    val zPath = tmpDir("zorder-z")
    ZOrder.write(ev, Seq("user_id", "value"), zPath, nFiles)

    // data preserved exactly
    assert(spark.read.parquet(zPath).count() == ev.count())
    assert(spark.read.parquet(zPath).agg(sum(col("event_id"))).head().getLong(0)
      == ev.agg(sum(col("event_id"))).head().getLong(0))

    val sortU = meanSpan(sortedPath, "user_id")
    val sortV = meanSpan(sortedPath, "value")
    val zU = meanSpan(zPath, "user_id")
    val zV = meanSpan(zPath, "value")
    info(f"user_id span: sorted $sortU%.3f vs z $zU%.3f; " +
      f"value span: sorted $sortV%.3f vs z $zV%.3f")
    // the single-column sort nails its own column but stays wide on value
    // (events' value is only partially correlated with user_id)
    assert(sortU < 0.2, s"sorted user_id span $sortU")
    // z-order: BOTH dimensions bounded — files cover a rectangle of
    // (user_id, value) space, so a predicate on EITHER column skips files
    assert(zU < 0.5, s"z user_id span $zU")
    assert(zV < 0.5, s"z value span $zV")
    // the property that matters for ad-hoc predicates: the z-layout's
    // WORST dimension beats the single-column layout's worst dimension
    // (min-max fairness — no dimension is left unprunable)
    assert(math.max(zU, zV) < math.max(sortU, sortV),
      s"z worst ${math.max(zU, zV)} vs sorted worst ${math.max(sortU, sortV)}")
    // and value-only predicates specifically skip far better than under
    // the user_id sort
    assert(zV < 0.6 * sortV, s"$zV !< 0.6*$sortV")
  }

  test("3-dimensional z-order bounds every dimension's per-file span") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val zPath = tmpDir("zorder-3d")
    ZOrder.write(ev, Seq("event_id", "user_id", "value"), zPath, 16)
    assert(spark.read.parquet(zPath).count() == ev.count())
    val spans = Seq("event_id", "user_id", "value").map(meanSpan(zPath, _))
    info(spans.map(s => f"$s%.3f").mkString("3-dim spans: ", ", ", ""))
    // with 3 interleaved dims and 16 files, each dim gets fewer bits of
    // the range split, so the bound is looser than 2-dim — but every
    // dimension must stay well under the blind 1.0
    assert(spans.forall(_ < 0.7), spans.mkString(","))
  }

  test("zvalue interleaves bucket bits (known corners)") {
    import spark.implicits._
    val df = Seq((0.0, 0.0), (255.0, 0.0), (0.0, 255.0), (255.0, 255.0),
      (128.0, 128.0)).toDF("x", "y")
    val z = ZOrder.zvalue(df, Seq("x", "y"))
      .orderBy(col("x"), col("y"))
      .select(col("x"), col("y"), col("__z")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    // x occupies even bits, y odd bits
    assert(z.contains((0.0, 0.0, 0L)))
    assert(z.contains((255.0, 0.0, 0x5555L)))   // 01010101... even bits
    assert(z.contains((0.0, 255.0, 0xAAAAL)))   // odd bits
    assert(z.contains((255.0, 255.0, 0xFFFFL)))
  }
}
