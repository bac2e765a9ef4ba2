package graft

import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** q_dedup_substring semantics pinned on a hand-built corpus: keep-first
  * duplicate marking, within-document repeats, island merging of
  * overlapping spans, full-document removal, and short-doc passthrough.
  * (The oracle gate checks the same plan against DuckDB on the fixture
  * corpus; this spec makes each semantic rule individually visible.)
  */
class SubstringDedupSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val dir: String = {
    val d = tmpDir("subdedup")
    val p = (1 to 8).map(i => s"P$i").mkString(" ") // the shared passage
    val q = (1 to 8).map(i => s"Q$i").mkString(" ")
    val r = (1 to 8).map(i => s"R$i").mkString(" ")
    val x = (1 to 8).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      // 1: all-unique tokens — untouched
      (1L, (1 to 20).map(i => s"a$i").mkString(" ")),
      // 2: first (and therefore kept) occurrence of passage P
      (2L, ((1 to 6).map(i => s"b$i") ++ Seq(p) ++
        (7 to 12).map(i => s"b$i")).mkString(" ")),
      // 3: second occurrence of P → span [4,11] removed
      (3L, (Seq("c1", "c2", "c3", p, "c4", "c5")).mkString(" ")),
      // 4: WITHIN-document repeat — second copy of x1..x8 removed
      (4L, Seq(x, x, "y1", "y2").mkString(" ")),
      // 5: first occurrence of the 16-token run R+Q — kept whole
      (5L, Seq("e1", r, q, "e2").mkString(" ")),
      // 6: every gram duplicated → 9 overlapping spans merge to [1,16],
      //    the whole document is removed
      (6L, Seq(r, q).mkString(" ")),
      // 7: shorter than one gram — no occurrences, untouched
      (7L, "s1 s2 s3"))
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private lazy val rows: Map[Long, (Long, Long, Long, String)] =
    DedupQueries.substringDedup(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap

  test("unique and short documents pass through untouched") {
    assert(rows(1L) == ((20L, 0L, 0L,
      md5hex((1 to 20).map(i => s"a$i").mkString(" ")))))
    assert(rows(7L) == ((3L, 0L, 0L, md5hex("s1 s2 s3"))))
  }

  test("keep-first: the globally-first occurrence survives, later ones go") {
    val p = (1 to 8).map(i => s"P$i").mkString(" ")
    // doc 2 holds the first occurrence — untouched
    assert(rows(2L) == ((20L, 0L, 0L,
      md5hex(((1 to 6).map(i => s"b$i") ++ Seq(p) ++
        (7 to 12).map(i => s"b$i")).mkString(" ")))))
    // doc 3's copy is removed: one 8-token span, survivors reassembled
    assert(rows(3L) == ((13L, 1L, 8L, md5hex("c1 c2 c3 c4 c5"))))
  }

  test("within-document repeats are deduplicated too") {
    val x = (1 to 8).map(i => s"x$i").mkString(" ")
    assert(rows(4L) == ((18L, 1L, 8L, md5hex(s"$x y1 y2"))))
  }

  test("overlapping spans merge; a fully-duplicated document empties") {
    // doc 5 is the first occurrence of the long run — kept whole
    assert(rows(5L)._2 == 0L)
    // doc 6: 9 overlapping 8-grams merge into ONE [1,16] span
    assert(rows(6L) == ((16L, 1L, 16L, md5hex(""))))
  }
}
