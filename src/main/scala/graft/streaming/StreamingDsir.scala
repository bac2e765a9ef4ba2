package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming DSIR scorer (st42) — the serving-path twin of
  * q_dsir_select, in the StreamingCusum FIXED-REFERENCE posture: the
  * hashed-bigram log-ratio model is trained offline
  * (PipelineQueries.dsirModelBundle over the reference corpus) and
  * arriving documents are scored online against it — recomputing the
  * model from the arriving stream itself would absorb exactly the
  * distribution shift the selector exists to correct.
  *
  * STATELESS map, the strongest streaming shape: each doc's score is a
  * per-row `aggregate()` fold over its own bigram buckets through a
  * plan-literal model map (≤ 8192 entries, model-sized — the PCA
  * pinned-component precedent), so there is no shuffle, no state
  * store, and micro-batch replay is trivially idempotent. Buckets the
  * reference corpus never saw score the model's unseen-bucket constant
  * (the Laplace-smoothed ratio at zero counts, carried as
  * `defaultLr`); docs scored from the training corpus itself hit only
  * seen buckets, so online scores equal batch q_dsir_select scores
  * EXACTLY (pinned by st42). Docs under 2 tokens are dropped, the
  * batch query's own domain rule.
  */
object StreamingDsir {

  private def bucket(g: Column): Column =
    pmod(conv(substring(md5(g), 1, 8), 16, 10).cast("long"), lit(8192L))

  /** `docs` must carry (doc_id, text); emits one
    * (doc_id, score_micro, n_bigrams) row per scoreable doc. */
  def score(docs: DataFrame, lr: Map[Long, Long],
      defaultLr: Long): DataFrame = {
    val m = typedlit(lr)
    docs
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> length(t) > 0)").as("w"))
      .filter(size(col("w")) >= 2)
      .withColumn("gs", expr("transform(sequence(1, size(w) - 1), " +
        "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
      .select(col("doc_id"),
        aggregate(col("gs"), lit(0L), (acc, g) =>
          acc + coalesce(element_at(m, bucket(g)), lit(defaultLr)))
          .as("score_micro"),
        size(col("gs")).cast("long").as("n_bigrams"))
  }
}
