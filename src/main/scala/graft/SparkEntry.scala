package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2.4 appears here as a named query with an
  * equivalent DuckDB oracle SQL (same column names; total ORDER BY).
  */
object SparkEntry {

  /** All query families (SURVEY.md §2.4 categories). */
  private val families: Seq[QuerySet] = Seq(
    CoreQueries,
    JoinQueries,
    AggQueries,
    WindowQueries,
    TimeseriesQueries,
    FunctionQueries,
    IngestQueries,
    DedupQueries,
    SimilarityQueries,
    TextQueries,
    MultimodalQueries,
    PipelineQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full corpus-cleaning pipeline in one Catalyst plan: word-5-gram
    * shingles → MinHash band LSH candidates → exact Jaccard verify →
    * drop losers → per-language survivor stats. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_dedup_apply")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.flatMap(_.oracle).toMap
}
