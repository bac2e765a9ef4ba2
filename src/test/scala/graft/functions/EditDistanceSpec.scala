package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the native full Damerau-Levenshtein expression. The
  * oracle (q_text_damerau) already pins it against DuckDB's
  * damerau_levenshtein on real fixture pairs; this spec pins it against
  * an INDEPENDENT definition — breadth-first search over the literal
  * edit-move space (insert/delete/substitute/adjacent-swap, unit cost) —
  * so both engines agreeing on a wrong variant (e.g. OSA) would still
  * fail here.
  */
class EditDistanceSpec extends SparkSpec {

  import spark.implicits._

  private def dl(a: String, b: String): Long =
    EditDistanceOps.damerauLevenshtein(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Ground truth by BFS over actual edit sequences: the unrestricted
    * Damerau-Levenshtein IS the length of the shortest such sequence.
    * Intermediate strings are capped at max(|a|,|b|)+1 — unit-cost
    * optimal paths never need to grow beyond that. */
  private def bfs(a: String, b: String): Int = {
    if (a == b) return 0
    val alpha = (a + b).distinct
    val maxLen = math.max(a.length, b.length) + 1
    def moves(s: String): Iterator[String] = {
      val del = s.indices.iterator.map(i => s.take(i) + s.drop(i + 1))
      val sub = for {
        i <- s.indices.iterator; c <- alpha.iterator if s(i) != c
      } yield s.updated(i, c)
      val ins =
        if (s.length >= maxLen) Iterator.empty
        else for {
          i <- (0 to s.length).iterator; c <- alpha.iterator
        } yield s.take(i) + c + s.drop(i)
      val swp = (0 until s.length - 1).iterator
        .filter(i => s(i) != s(i + 1))
        .map(i => s.take(i) + s(i + 1) + s(i) + s.drop(i + 2))
      del ++ sub ++ ins ++ swp
    }
    var frontier = Set(a)
    val seen = scala.collection.mutable.Set(a)
    var depth = 0
    while (true) {
      depth += 1
      frontier = frontier.flatMap(moves(_).filterNot(seen))
      if (frontier(b)) return depth
      seen ++= frontier
    }
    -1 // unreachable
  }

  test("pinned values distinguish the FULL metric from OSA and plain " +
      "Levenshtein") {
    // the Lowrance-Wagner signature case: transposition + later edit
    assert(dl("CA", "ABC") == 2L) // OSA would say 3
    assert(dl("ab", "ba") == 1L)
    assert(dl("kitten", "sitting") == 3L)
    assert(dl("", "abc") == 3L && dl("abc", "") == 3L)
    assert(dl("", "") == 0L)
    assert(dl("hte", "the") == 1L) // the keystroke-error canon
  }

  test("matches BFS ground truth over the literal edit-move space on " +
      "exhaustive short strings") {
    val alphabet = "abc"
    val strs = (0 to 3).flatMap(n =>
      Seq.fill(n)(alphabet).flatten.combinations(n)
        .flatMap(_.permutations).map(_.mkString)).distinct
    for (a <- strs; b <- strs) {
      assert(dl(a, b) == bfs(a, b).toLong, s"dl('$a','$b')")
    }
  }

  test("metric properties on fixture prefixes: symmetric, bounded by " +
      "levenshtein, at least the length gap") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(substring(col("text"), 1, 40).as("ta"),
        substring(reverse(col("text")), 1, 40).as("tb"))
      .withColumn("dl_ab", EditDistanceOps.damerau_levenshtein(
        col("ta"), col("tb")))
      .withColumn("dl_ba", EditDistanceOps.damerau_levenshtein(
        col("tb"), col("ta")))
      .withColumn("lev", levenshtein(col("ta"), col("tb")).cast("long"))
    val bad = d.filter(col("dl_ab") =!= col("dl_ba") ||
      col("dl_ab") > col("lev") ||
      col("dl_ab") < abs(length(col("ta")) - length(col("tb"))).cast("long"))
      .count()
    assert(bad == 0L)
  }

  test("the expression stays inside whole-stage codegen (static-call " +
      "shape, no UDF fallback)") {
    // a parquet-backed frame: a literal Seq collapses to LocalTableScan
    // via ConvertToLocalRelation before any codegen happens
    val plan = graft.Tables.load(spark, "/root/testdata/sf0.001",
        "documents")
      .select(EditDistanceOps.damerau_levenshtein(
        col("text"), reverse(col("text"))).as("d"))
      .queryExecution.executedPlan.toString
    // `*(n)` is the whole-stage-codegen marker in the executed plan's
    // simple string; a fallback would print a bare Project and/or UDF
    assert(plan.contains("*(1) Project") &&
      plan.contains("damerau_levenshtein") && !plan.contains("UDF"),
      s"damerau_levenshtein fell out of codegen:\n$plan")
  }
}
