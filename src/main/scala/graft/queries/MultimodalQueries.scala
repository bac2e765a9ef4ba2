package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal-column pipeline as an oracle-checked query: the binary
  * payload plumbing runs through `Multimodal.extractFeatures` (typed
  * Dataset + mapPartitions batch shape); the DuckDB oracle recomputes the
  * deterministic byte statistics directly from the text the payloads were
  * derived from. Only the decode body is a stub — the schema, partition
  * processing, and feature output are the real thing.
  *
  * Oracle caveat: the SQL side counts characters/codepoints (strlen/ascii),
  * the Spark side counts UTF-8 bytes — equivalent only because the synthetic
  * corpus is pure ASCII (verified at sf0.01/0.1). Real multimodal payloads
  * are binary anyway; this equivalence is a fixture property, not a claim.
  */
object MultimodalQueries extends QuerySet {

  val queries: Map[String, Q] = Map(
    "q_multimodal_features" -> { (s, dir) =>
      Multimodal.featureFrame(s, t(s, dir, "documents"))
        .withColumn("mean_byte_micro",
          floor(col("mean_byte") * 1000000.0 + 0.5).cast("long"))
        .drop("mean_byte")
        .orderBy(col("doc_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_features" ->
      """WITH b AS (
        |  SELECT doc_id, strlen(text) AS n,
        |         ascii(substr(text, 1, 1)) AS first_byte,
        |         list_sum(list_transform(range(1, strlen(text) + 1),
        |                                 i -> ascii(substr(text, CAST(i AS INT), 1)))) AS s,
        |         len(list_distinct([substr(text, CAST(i AS INT), 1)
        |                            FOR i IN range(1, strlen(text) + 1)])) AS nd
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(16 + n % 64 AS INT) AS width,
        |  CAST(16 + first_byte % 64 AS INT) AS height,
        |  CAST(s % 997 AS BIGINT) AS checksum,
        |  CAST(nd AS BIGINT) AS n_distinct_bytes,
        |  CAST(floor(CAST(s AS DOUBLE) / n * 1000000.0 + 0.5) AS BIGINT) AS mean_byte_micro
        |FROM b ORDER BY doc_id""".stripMargin
  )
}
