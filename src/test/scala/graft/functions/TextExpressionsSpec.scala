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

  test("repetition_stats equals the explode/groupBy/window canon it " +
      "replaced on fixture documents plus edge tokenizations") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (9001L, "solo"), // 1 token: pseudo bigram & trigram = the token
        (9002L, "a b"), // 2 tokens: trigram = the pair
        (9003L, "x x x x"), // maximal repetition
        (9004L, "a  b") // empty token from the double space (raw split)
      ).toDF("doc_id", "text"))
    // the pre-round-10 formulation, verbatim shape
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"),
        explode(expr("sequence(1, greatest(size(w) - 1, 1))")).as("i"))
      .select(col("doc_id"), explode(array(
        struct(lit(2).as("k"),
          array_join(slice(col("w"), col("i"), lit(2)), " ").as("g")),
        struct(lit(3).as("k"),
          when(col("i") <= expr("greatest(size(w) - 2, 1)"),
            array_join(slice(col("w"), col("i"), lit(3)), " ")).as("g"))))
        .as("kg"))
      .select(col("doc_id"), col("kg.k").as("k"), col("kg.g").as("g"))
      .filter(col("g").isNotNull)
    val byDoc = Window.partitionBy(col("doc_id"))
    val canon = grams.groupBy(col("doc_id"), col("k"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("n2", sum(when(col("k") === 2, col("cnt"))).over(byDoc))
      .withColumn("n2d", sum(when(col("k") === 2, 1L)).over(byDoc))
      .withColumn("n3", sum(when(col("k") === 3, col("cnt"))).over(byDoc))
      .withColumn("n3d", sum(when(col("k") === 3, 1L)).over(byDoc))
      .withColumn("rn", row_number().over(
        byDoc.orderBy(col("k").asc, col("cnt").desc, col("g").asc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("n2"), col("n2d"), col("n3"), col("n3d"),
        col("g"), col("cnt"))
    val native = docs
      .withColumn("r", TextOps.repetition_stats(col("text")))
      .select(col("doc_id"), col("r.n2"), col("r.n2d"), col("r.n3"),
        col("r.n3d"), col("r.top_bigram"), col("r.top_cnt"))
    val mism = canon.exceptAll(native).count() +
      native.exceptAll(canon).count()
    assert(mism == 0L, "native repetition_stats diverged from the canon")
  }

  test("classifier_scores is null-preserving") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("text")
      .select(TextOps.classifier_scores(col("text")).as("cs"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
  }
}
