package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Streaming multiclass confusion / precision-recall-F1 — the online
  * twin of q_eval_confusion (st44): documents arrive WHOLE, the
  * language-ID argmax is MAP-ONLY (the shared langidPredicted — the
  * same classifier q_text_langid ships), and ONE complete-mode
  * (labeled, predicted) cell count is the entire state (≤ |langs|²
  * rows at any corpus size; merges additively — the st18 recipe). The
  * readout recomputes per-class tp/fp/fn, the integer-micro
  * precision/recall/F1, and the corpus accuracy with the SAME shared
  * confusionReadout as the batch query, so streamed == batch holds
  * bit-for-bit over EVERY arrived prefix.
  *
  * Why this matters online: a live router/filter built on a classifier
  * needs its error MIX (which class eats which) watched continuously,
  * not just an aggregate rate; a CLASS-domain-bounded online confusion
  * matrix gives that without ever rescanning the corpus.
  */
object StreamingConfusion {

  /** `docs`: streaming (text, lang) rows — one per whole document.
    * Returns the (labeled, predicted) → n cell rollup; run it in
    * complete mode into the serving sink. */
  def cells(docs: DataFrame): DataFrame =
    TextQueries.langidPredicted(docs)
      .groupBy(col("labeled"), col("predicted"))
      .agg(count(lit(1)).as("n"))

  /** Per-class metrics over the accumulated cells — IDENTICAL to
    * q_eval_confusion over the arrived prefix (shared definition). */
  def readout(state: DataFrame): DataFrame =
    TextQueries.confusionReadout(state)
}
