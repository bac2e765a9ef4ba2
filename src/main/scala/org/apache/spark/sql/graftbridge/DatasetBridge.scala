package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Spark 4 scoped `Dataset.ofRows` to `private[sql]` under the classic
  * package. The binned range-join rule needs it to price a candidate
  * rewrite (one model-sized aggregate over the interval side) — same shim
  * idiom as [[ColumnBridge]], no Spark internals modified.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
