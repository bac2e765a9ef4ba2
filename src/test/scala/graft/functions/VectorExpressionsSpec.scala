package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the native vector expressions, pinned against the SQL
  * higher-order formulations they replaced (the bit-identity that lets
  * the DuckDB oracles stay unchanged) and against hand-derived values.
  */
class VectorExpressionsSpec extends SparkSpec {

  import spark.implicits._

  test("vec_project equals the transform(aggregate(...)) SQL it replaced, " +
      "element for element, on real fixture vectors") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50)
    // the q_embed_project SQL formulation, n = 64 hardcoded as the
    // oracle hardcodes it (VecProject derives n from the array length)
    val sqlForm = expr(
      "transform(sequence(0, 15), j -> CAST(aggregate(sequence(1, 64), " +
      "CAST(0 AS BIGINT), (a, i) -> a + CAST(floor(" +
      "CAST(element_at(embedding, i) AS DOUBLE) * " +
      "(1 - 2 * (((CAST(j * 64 + i AS BIGINT) * CAST(j * 64 + i AS BIGINT) " +
      "* 48271 + CAST(j * 64 + i AS BIGINT) * 2654435761 + 7) " +
      "% 1000003) % 2)) " +
      "* 1000000.0 + 0.5) AS BIGINT)) AS BIGINT))")
    val diffs = e.select(
        VecOps.vec_project(col("embedding"), 16).as("native"),
        sqlForm.as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diffs == 0L, "native projection diverged from the SQL canon")
  }

  test("vec_dot_long equals the aggregate(zip_with(...)) double fold") {
    val df = Seq(
      (Seq(1L, -2L, 3L), Seq(4L, 5L, -6L)),
      (Seq(1000000L, 2000000L), Seq(3000000L, -4000000L)),
      (Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    val sqlForm = expr("aggregate(zip_with(a, b, (x, y) -> " +
      "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), " +
      "(acc, x) -> acc + x)")
    val rows = df.select(
        VecOps.vec_dot_long(col("a"), col("b")).as("native"),
        sqlForm.as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native ${r.getDouble(0)} != fold ${r.getDouble(1)}"))
  }

  test("vec_project hand-check: constant vector, known sign parities") {
    // v = all 1.0f, n = 2, out = 1: terms are ±1e6 by the parity of
    // h(k) = (k²·48271 + k·2654435761 + 7) mod 1000003 at k = 1, 2
    def sgn(k: Long): Long =
      1L - 2L * (((k * k * 48271L + k * 2654435761L + 7L) % 1000003L) % 2L)
    val expected = (sgn(1) + sgn(2)) * 1000000L
    val got = Seq(Tuple1(Seq(1.0f, 1.0f))).toDF("v")
      .select(VecOps.vec_project(col("v"), 1))
      .head().getSeq[Long](0)
    assert(got == Seq(expected), s"got $got, want $expected")
  }

  test("vec_project and vec_dot_long run inside whole-stage codegen " +
      "(no silent interpreted fallback)") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false") // codegen errors throw
    try {
      val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      val df = e.select(VecOps.vec_project(col("embedding"), 16).as("p"))
        .select(VecOps.vec_dot_long(col("p"), col("p")).as("d"))
      // '*(n)' marks the WholeStageCodegen stage in the executed plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1) Project"), plan.take(2000))
      assert(df.head().getDouble(0) > 0.0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("vec_dot_long rejects dimension mismatch and null elements") {
    val bad = Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
    val ex = intercept[Exception] {
      bad.select(VecOps.vec_dot_long(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage != null)
  }
}
