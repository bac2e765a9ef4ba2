package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional data-skipping
  * lever for lakehouse tables (the layout behind Delta's OPTIMIZE ZORDER BY
  * and Iceberg's sort-order rewrite, built here from plain Spark ops).
  *
  * Partitioning prunes on ONE column hierarchy and bucketing co-locates
  * ONE join key; when queries filter on SEVERAL independent columns
  * (user_id AND value, lat AND lon), sorting by any single column leaves
  * every file spanning the full range of the others. Interleaving the
  * bits of per-column bucket ranks puts rows that are close in ALL
  * dimensions into the same files, so parquet footer min/max stats make
  * the reader skip most files for predicates on ANY of the z-columns.
  * That skipping needs no engine support beyond what parquet already does
  * — the win is purely in the write layout.
  *
  * Scale shape: one tiny min/max aggregate (1-row broadcast — quantile
  * boundaries would drop in here for skewed columns), a map-only z-value
  * projection (pure codegen'd bit arithmetic, no UDF), and one range
  * repartition by z — the same shuffle count as a plain sorted write.
  */
object ZOrder {

  private val BitsPerDim = 8 // 256 buckets per dimension

  /** Interleave the low `BitsPerDim` bits of `b` starting at bit offset
    * `dim`, striding by `ndims` — plain Column bit arithmetic so the whole
    * z-value stays inside whole-stage codegen. */
  private def spreadBits(b: Column, dim: Int, ndims: Int): Column =
    (0 until BitsPerDim).map { i =>
      shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * ndims + dim)
    }.reduce(_ bitwiseOR _)

  /** The Morton z-value for `cols` (all cast to double, ranked into 256
    * min/max buckets each). Exposed for tests. */
  def zvalue(df: DataFrame, cols: Seq[String]): DataFrame = {
    val ndims = cols.length
    require(ndims >= 2, "z-ordering needs at least 2 columns")
    // shiftleft wraps its shift amount mod 64: bit positions past 63
    // would silently collide with low dims instead of failing
    require(ndims * BitsPerDim <= 63,
      s"z-ordering supports at most ${63 / BitsPerDim} columns " +
        s"($BitsPerDim bits each); got $ndims")
    // per-column min/max as a 1-row broadcast (no collect; swap in
    // approx_percentile boundaries for heavily skewed columns)
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val bucketed = df.crossJoin(broadcast(stats))
    val z = cols.zipWithIndex.map { case (c, dim) =>
      val mn = col(s"__mn_$c")
      val span = col(s"__mx_$c") - mn
      // bucket in [0, 255]; constant columns collapse to bucket 0
      val b = when(span === 0d, lit(0L)).otherwise(
        least(floor((col(c).cast("double") - mn) / span * (1 << BitsPerDim))
          .cast("long"), lit((1 << BitsPerDim) - 1L)))
      spreadBits(b, dim, ndims)
    }.reduce(_ bitwiseOR _)
    bucketed.withColumn("__z", z)
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** Rewrite `df` into `files` files clustered on the z-curve over `cols`:
    * range-partition by z-value (so files own disjoint z-ranges), sort
    * within each, drop the helper column, write. */
  def write(df: DataFrame, cols: Seq[String], outPath: String,
      files: Int): Unit =
    zvalue(df, cols)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outPath)
}
