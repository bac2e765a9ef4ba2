package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.IngestPipeline
import graft.queries.AggQueries

/** Custom function surfaces: native Catalyst expression, scalar UDFs,
  * approx-sketch tolerances (SURVEY §2.4d/k, §7.5).
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("ParseLine native expression: Column and SQL surfaces") {
    val df = Seq(
      "cpu,host=a usage=0.5,idle=0.5 1700000000000000000",
      "bogus").toDF("value")
    val viaColumn = df.select(
      ParseLine.parse_line_expr(col("value")).as("r"))
      .select(col("r.measurement"), col("r.fields"), col("r.ts"), col("r.error"))
      .collect()
    assert(viaColumn(0).getString(0) == "cpu")
    assert(viaColumn(0).getMap[String, Double](1) ==
      Map("usage" -> 0.5, "idle" -> 0.5))
    assert(viaColumn(0).getLong(2) == 1700000000000000000L)
    assert(viaColumn(1).isNullAt(0) && !viaColumn(1).isNullAt(3))

    ParseLine.register(spark)
    df.createOrReplaceTempView("raw_lines")
    val viaSql = spark.sql(
      "SELECT parse_line_expr(value).measurement AS m FROM raw_lines " +
        "WHERE parse_line_expr(value).error IS NULL").collect()
    assert(viaSql.map(_.getString(0)).toSeq == Seq("cpu"))
  }

  test("ParseLine compiles in whole-stage codegen (no silent fallback)") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false") // codegen errors throw
    try {
      val got = Seq("cpu usage=1.0 1").toDF("value")
        .select(ParseLine.parse_line_expr(col("value"))
          .getField("measurement").as("m"))
        .collect().map(_.getString(0)).toSeq
      assert(got == Seq("cpu"))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("parse_line / to_line UDFs round-trip in SQL (typed fields)") {
    IngestPipeline.registerUdfs(spark)
    // doubles, ints (42i), bools, and quoted strings all round-trip
    Seq("m,a=1 f=2.5 42",
        "m,a=1 b=true,f=2.5,s=\"x y\" 42",
        "m,a=1 f=2.5,n=-7i,s=\"x y\" 42").foreach { line =>
      val got = spark.sql(
        s"""SELECT to_line(r._1, r._2, r._3, r._4, r._5, r._6, r._7) AS line
           |FROM (SELECT parse_line('${line.replace("\"", "\\\"")}') AS r)"""
          .stripMargin)
        .head().getString(0)
      assert(got == line)
    }
  }

  test("explode_line generator: per-field fan-out with the typed union, " +
      "error rows, NULL-in-nothing-out, and DSv2-source equivalence") {
    graft.functions.ExplodeLine.register(spark)
    val lines = Seq(
      "cpu,host=web1 usage=0.64,n=7i 1700000000000000000",
      "mem,host=web2 s=\"x\",up=true",
      "not a line")
    import spark.implicits._
    lines.toDF("value").createOrReplaceTempView("raw_lines")
    val gen = spark.sql("SELECT explode_line(value) FROM raw_lines")
    assert(gen.schema == graft.sources.LineProtocolSource.schema)
    val rows = gen.collect()
    assert(rows.length == 5) // 2 + 2 fields fanned out + 1 error row
    val byName = rows.filter(_.getAs[String]("parse_error") == null)
      .map(r => r.getAs[String]("name") -> r).toMap
    assert(byName("usage").getAs[Double]("value") == 0.64)
    assert(byName("n").getAs[Long]("value_long") == 7L)
    assert(byName("n").getAs[Long]("time_ns") == 1700000000000000000L)
    assert(byName("s").getAs[String]("value_str") == "x")
    assert(byName("up").getAs[Boolean]("value_bool") == true)
    assert(byName("usage").getAs[Map[String, String]]("tags") ==
      Map("host" -> "web1"))
    assert(rows.count(_.getAs[String]("parse_error") != null) == 1)
    // NULL input generates nothing, like explode(NULL)
    assert(spark.sql(
      "SELECT explode_line(CAST(NULL AS STRING))").count() == 0)
    // one semantics, two surfaces: the generator's output equals the
    // DSv2 source reading the same lines
    val dir = tmpDir("graft-explode-line")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.lp"),
      String.join("\n", lines: _*).getBytes)
    val src = spark.read.format("lineprotocol").load(dir)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(gen) == canon(src))
  }

  test("explode_line with wrong arity raises the standard WRONG_NUM_ARGS " +
      "analysis error, not a NoSuchElementException") {
    graft.functions.ExplodeLine.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT explode_line()").collect()
    }
    assert(e.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      s"unexpected error condition: ${e.getCondition}\n${e.getMessage}")
    assert(e.getMessage.contains("explode_line"))
  }

  test("approx sketches stay within tolerance of exact (q_approx_sketches)") {
    val dir = "/root/testdata/sf0.001"
    // the query now self-certifies (within_tol booleans hash-checked by the
    // driver against literal TRUE); here assert the booleans hold and the
    // exact columns agree with an independently-built exact aggregate
    val rows = AggQueries.queries("q_approx_sketches")(spark, dir).collect()
    assert(rows.nonEmpty)
    val exact = graft.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val k = r.getString(0)
      assert(r.getLong(1) == exact(k)._1, s"exact_parts off for $k")
      assert(r.getDouble(2) == exact(k)._2, s"exact_median off for $k")
      assert(r.getBoolean(3), s"HLL out of tolerance for $k")
      assert(r.getBoolean(4), s"approx median out of tolerance for $k")
    }
  }
}
