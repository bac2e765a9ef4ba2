package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TextQueries

/** Semantics of the native classifier-scoring expression, pinned against
  * the HigherOrderFunction SQL canon it replaced (the bit-identity that
  * lets the three DuckDB oracles stay unchanged) and against edge-case
  * tokenizations.
  */
class TextExpressionsSpec extends SparkSpec {

  import spark.implicits._

  // the exact pre-round-10 formulation: filter(split) tokens, uni/bi
  // aggregate towers, token count
  private val hofTokens =
    expr("filter(split(text, ' '), tk -> length(tk) > 0)")

  test("classifier_scores equals the filter/transform/aggregate canon on " +
      "real fixture documents (n_tok, uni, bi all bit-identical)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("wtok", hofTokens)
      .withColumn("uni_hof", expr(
        s"aggregate(transform(wtok, tk -> ${TextQueries.wgtExpr("tk")}), " +
        "CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("bg", expr(
        "CASE WHEN size(wtok) > 1 THEN transform(sequence(1, size(wtok) - 1), " +
        "i -> concat(element_at(wtok, i), '_', element_at(wtok, i + 1))) " +
        "ELSE CAST(array() AS ARRAY<STRING>) END"))
      .withColumn("bi_hof", expr(
        s"aggregate(transform(bg, tk -> ${TextQueries.wgtExpr("tk")}), " +
        "CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("cs", TextOps.classifier_scores(col("text")))
    val bad = docs.filter(
      col("cs").getItem(0) =!= size(col("wtok")).cast("long") ||
      col("cs").getItem(1) =!= col("uni_hof") ||
      col("cs").getItem(2) =!= col("bi_hof")).count()
    assert(bad == 0L, "native classifier_scores diverged from the HOF canon")
  }

  test("classifier_scores edge tokenizations match the canon") {
    val df = Seq(
      "", // no tokens at all
      " ", // separators only
      "solo", // single token, no bigrams
      "a b", // one bigram
      "  leading  double  spaces ", // empty splits filtered
      "x_y z", // underscore inside a token vs the bigram joiner
      "repeat repeat repeat").toDF("text")
      .withColumn("wtok", hofTokens)
      .withColumn("uni_hof", expr(
        s"aggregate(transform(wtok, tk -> ${TextQueries.wgtExpr("tk")}), " +
        "CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("bg", expr(
        "CASE WHEN size(wtok) > 1 THEN transform(sequence(1, size(wtok) - 1), " +
        "i -> concat(element_at(wtok, i), '_', element_at(wtok, i + 1))) " +
        "ELSE CAST(array() AS ARRAY<STRING>) END"))
      .withColumn("bi_hof", expr(
        s"aggregate(transform(bg, tk -> ${TextQueries.wgtExpr("tk")}), " +
        "CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("cs", TextOps.classifier_scores(col("text")))
    df.collect().foreach { r =>
      val cs = r.getSeq[Long](r.fieldIndex("cs"))
      val n = r.getSeq[String](r.fieldIndex("wtok")).size.toLong
      assert(cs(0) == n, s"n_tok ${cs(0)} != $n for '${r.getString(0)}'")
      assert(cs(1) == r.getLong(r.fieldIndex("uni_hof")),
        s"uni diverged for '${r.getString(0)}'")
      assert(cs(2) == r.getLong(r.fieldIndex("bi_hof")),
        s"bi diverged for '${r.getString(0)}'")
    }
  }

  test("classifier_scores is null-preserving") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("text")
      .select(TextOps.classifier_scores(col("text")).as("cs"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
  }
}
