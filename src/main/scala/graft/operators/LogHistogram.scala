package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log-binned value histograms (the HdrHistogram / Prometheus
  * native-histogram shape) — ONE bin definition shared by the engine's
  * per-day rollup (Engine.histogramRollup), its quantile reads
  * (Engine.approxQuantiles) and the streaming histogram (StreamingSpec
  * st18), so the batch and online forms are the same summary by
  * construction.
  *
  * Bin 0 holds exact zero, positive values land in
  * `1 + floor(ln(v)/ln(G))`, negatives mirror below zero. G = 1.01 →
  * every bin spans 1% relative width, so a quantile read back from bin
  * midpoints carries ≤ ~0.5% relative error. Bin ids are bounded
  * integers (|bin| ≤ ~69k over the whole double range): a histogram is
  * catalog-sized whatever the row count, and histograms MERGE by plain
  * count addition — associative and order-free, the same
  * mergeable-summary property HLL gives distinct counts, here for
  * percentiles. */
object LogHistogram {

  val growth: Double = 1.01
  private val lnG = math.log(growth)

  def binExpr(v: Column): Column =
    when(v === 0.0, lit(0L))
      .when(v > 0.0,
        (floor(org.apache.spark.sql.functions.log(v) / lnG) + 1)
          .cast("long"))
      .otherwise(
        (-floor(org.apache.spark.sql.functions.log(-v) / lnG) - 1)
          .cast("long"))

  /** Geometric midpoint of a bin — the value a quantile answer reports. */
  def repExpr(bin: Column): Column =
    when(bin === 0L, lit(0.0))
      .when(bin > 0L, pow(lit(growth), bin.cast("double") - 0.5))
      .otherwise(-pow(lit(growth), -bin.cast("double") - 0.5))

  /** Quantiles from a merged (bin, w) frame: the first bin whose
    * cumulative weight reaches q·N, reported at the bin midpoint. The
    * cumulative window is global but runs over a CATALOG-sized frame
    * (bounded by value dynamic range, independent of row count). Empty
    * input → empty frame. */
  def quantiles(bins: DataFrame, qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = bins.sparkSession
    val cum = bins
      .withColumn("cum", sum(col("w")).over(Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("w")).over(
        Window.partitionBy(lit(1))))
    val qDf = spark.createDataFrame(qs.map(Tuple1(_))).toDF("q")
    qDf.join(cum, col("cum") >= col("q") * col("total"))
      .groupBy(col("q"))
      .agg(min(col("bin")).as("bin"), min(col("total")).as("n_rows"))
      .select(col("q").as("quantile"), repExpr(col("bin")).as("approx_value"),
        col("n_rows"))
      .orderBy(col("quantile"))
  }
}
