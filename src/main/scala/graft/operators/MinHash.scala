package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable MinHash signatures as MAP-ONLY column expressions: the word
  * 5-gram shingle set, its size, and the three 2-hash band keys are all
  * computed with higher-order array functions on the document row — no
  * explode, no aggregation, no shuffle. The minimum over the DISTINCT
  * shingle array equals the multiset minimum, so the values are
  * bit-identical to the aggregate formulation (and to the DuckDB oracle).
  *
  * Shared by the batch LSH pipeline (DedupQueries — candidate generation
  * becomes scan→map→band-join) and streaming incremental dedup
  * (streaming.StreamingDedup — a stateless projection is exactly what a
  * micro-batch pipeline can run per arriving document).
  */
object MinHash {

  /** Distinct word 5-gram shingles of a text column, as an array. */
  def shingleArr(text: Column): Column = {
    val w = split(text, " ")
    array_distinct(transform(
      sequence(lit(1), greatest(size(w) - 4, lit(1))),
      i => array_join(slice(w, i, lit(5)), " ")))
  }

  private def minhash(shd: Column, seed: Int): Column =
    array_min(transform(shd, e => md5(concat(lit(s"s$seed"), e))))

  /** The 3 band keys (2 minhashes each, band index prefixed so bands can
    * never cross-match) over a distinct-shingle array column. */
  def bandKeys(shd: Column): Column = array(
    concat(lit("1:"), minhash(shd, 1), minhash(shd, 2)),
    concat(lit("2:"), minhash(shd, 3), minhash(shd, 4)),
    concat(lit("3:"), minhash(shd, 5), minhash(shd, 6)))
}
