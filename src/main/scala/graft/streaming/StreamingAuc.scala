package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.queries.TextQueries

/** Streaming model-evaluation AUC — the online twin of q_eval_auc
  * (st41): documents arrive WHOLE (the st36/st39 posture), scoring is
  * MAP-ONLY (the shared aucScored — one native classifier_scores pass
  * + one stopword filter), and ONE complete-mode tagged count is the
  * entire state: (evaluator, score-value) → (cnt, positives), which
  * merges additively across micro-batches — exactly what the streaming
  * agg does, no custom state machine (the st18 state-store-is-the-
  * rollup recipe). The readout recomputes the exact tie-averaged
  * integer rank-sum over the accumulated groups with the SAME shared
  * definition as the batch query, so streamed == batch holds
  * bit-for-bit over EVERY arrived prefix.
  *
  * Why this matters online: evaluation metrics of a live scorer (the
  * quality gate on an ingest stream) drift with the corpus; a
  * state-bounded online AUC means the drift readout never rescans the
  * corpus. State is SCORE-DOMAIN bounded (micro fractions of bounded
  * ratios — the domain saturates), never document-count sized.
  */
object StreamingAuc {

  /** `docs`: streaming (text, lang) rows — one per whole document.
    * Returns the tagged (evaluator, sc) → (cnt, pc) rollup; run it in
    * complete mode into the serving sink. */
  def groups(docs: DataFrame): DataFrame =
    TextQueries.aucGroups(TextQueries.aucScored(docs))

  /** AUC per evaluator over the accumulated state — IDENTICAL to
    * q_eval_auc over the arrived prefix (shared definition). */
  def readout(state: DataFrame): DataFrame =
    TextQueries.aucFromGroups(state)
}
