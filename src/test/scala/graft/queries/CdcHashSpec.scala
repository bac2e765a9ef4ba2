package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pin for the r17 q_dedup_cdc rolling-hash decomposition: the new
  * per-word-hash form (H(s1 ++ s2) = H(s1)·131^|s2| + H(s2) mod
  * 1000003, space folded as ascii 32) must equal the OLD per-position
  * re-join/re-split fold BIT-IDENTICALLY at every position — including
  * the edge cases the decomposition hinges on: consecutive spaces
  * (empty words mid-array), leading/trailing spaces, the empty
  * document, and single-word documents. This spec caught a real
  * divergence on first run: Spark's split(s, '') yields characters
  * with NO trailing zero-width element, unlike raw Java String.split
  * with limit -1, so the draft's trailing ·131 shift was wrong — every
  * position differed by exactly ×131 mod p. The old expression lives
  * HERE as the reference; the oracle pins the same equality
  * cross-engine at two SFs. */
class CdcHashSpec extends SparkSpec {

  import spark.implicits._

  test("new per-word rolling hash == old re-split fold at every " +
      "position on edge-case texts") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a",
      "",
      "double  space",
      " leading",
      "trailing ",
      "  ",
      "repeat repeat repeat repeat",
      "punctuation, works! and~07 suffixed~07 words~07",
      "x yz wvu tsrq ponml"
    )
    val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))

    val oldH3 = base
      .select(col("doc_id"), col("ws"),
        explode(expr("sequence(1, greatest(size(ws), 1))")).as("pos"))
      .select(col("doc_id"), col("pos"),
        expr("aggregate(transform(split(array_join(" +
          "slice(ws, greatest(pos - 2, 1), " +
          "pos - greatest(pos - 2, 1) + 1), ' '), ''), " +
          "c -> CAST(ascii(c) AS BIGINT)), CAST(0 AS BIGINT), " +
          "(a, c) -> (a * 131 + c) % 1000003)").as("h3"))

    val newH3 = base
      .select(col("doc_id"), col("ws"), expr(
          "transform(transform(ws, w -> filter(split(w, ''), " +
          "c -> c != '')), cs -> aggregate(cs, CAST(0 AS BIGINT), " +
          "(a, c) -> (a * 131 + CAST(ascii(c) AS BIGINT)) % 1000003))")
          .as("hws"),
        expr(
          "transform(transform(ws, w -> filter(split(w, ''), " +
          "c -> c != '')), cs -> aggregate(cs, CAST(1 AS BIGINT), " +
          "(a, c) -> (a * 131) % 1000003))").as("pws"))
      .select(col("doc_id"), col("hws"), col("pws"), col("ws"),
        explode(expr("sequence(1, greatest(size(ws), 1))")).as("pos"))
      .select(col("doc_id"), col("pos"),
        expr("CASE WHEN pos = 1 THEN element_at(hws, 1) ELSE " +
          "aggregate(sequence(greatest(pos - 2, 1) + 1, pos), " +
          "element_at(hws, greatest(pos - 2, 1)), " +
          "(a, j) -> ((a * 131 + 32) % 1000003 * element_at(pws, j) " +
          "+ element_at(hws, j)) % 1000003) END").as("h3"))

    val o = oldH3.orderBy(col("doc_id"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val n = newH3.orderBy(col("doc_id"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(o.nonEmpty && o.size == n.size)
    assert(o == n, {
      val bad = o.zip(n).filter { case (a, b) => a != b }.take(5)
      s"h3 mismatch at ${bad.mkString(", ")}"
    })
  }
}
