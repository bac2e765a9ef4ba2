package graft.queries

import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2.4 h: Q27-Q32) — string, date/time,
  * math, array (incl. higher-order), map, json.
  *
  * The reference stores timestamps but never manipulates them (only compares,
  * refluxdb src/persistence.rs:178) and serializes tags to a JSON string
  * (src/persistence.rs:113) — these families are the declared Spark-native
  * superset. Everything here is a codegen'd built-in (no UDFs), so each query
  * stays inside one WholeStageCodegen span over the scan.
  */
object FunctionQueries extends QuerySet {

  val queries: Map[String, Q] = Map(
    // Q27: string functions.
    "q27_string_funcs" -> { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_type")).as("lo"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 1, 5).as("sub"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("cat"),
        lpad(col("p_brand"), 12, "*").as("lp"),
        rpad(col("p_type"), 10, "#").as("rp"),
        expr("replace(p_name, ' ', '_')").as("repl"),
        translate(col("p_name"), "aeiou", "AEIOU").as("tran"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        col("p_name").rlike("^[bgr]").as("starts_bgr"))
        .orderBy(col("p_partkey"))
    },

    // Q28: date/time functions — date_trunc is the TSDB downsampling
    // workhorse; dow normalized to DuckDB's Sunday=0 convention.
    "q28_datetime_funcs" -> { (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        ntz(date_trunc("month", col("o_orderdate"))).as("mon"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        (dayofweek(col("o_orderdate")) - 1).as("dow"),
        date_add(col("o_orderdate"), 30).as("plus30"),
        datediff(lit("2000-01-01").cast("date"), col("o_orderdate"))
          .as("days_to_2000"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        from_unixtime(lit(1700000000L)).as("from_unix"),
        ntz(to_timestamp(
          concat(lit("2024-03-0"), (col("o_orderkey") % 9 + 1).cast("string")),
          "yyyy-MM-dd")).as("parsed"))
        .orderBy(col("o_orderkey"))
    },

    // Q29: math functions (c_acctbal has negatives: abs/sign/mod matter).
    "q29_math_funcs" -> { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        abs(col("c_acctbal")).as("abs_bal"),
        floor(col("c_acctbal")).as("fl"),
        ceil(col("c_acctbal")).as("ce"),
        round(col("c_acctbal"), 1).as("r1"),
        r6(col("c_acctbal") % 97).as("md"),
        pow(lit(2.0), (col("c_custkey") % 10).cast("double")).as("pw"),
        r6(sqrt(abs(col("c_acctbal")))).as("sq"),
        r6(exp(col("c_acctbal") / 10000)).as("ex"),
        r6(log(abs(col("c_acctbal")) + 1)).as("ln_"),
        r6(log10(abs(col("c_acctbal")) + 1)).as("lg"),
        signum(col("c_acctbal")).cast("int").as("sgn"))
        .orderBy(col("c_custkey"))
    },

    // Q30: array functions incl. higher-order aggregate/transform over the
    // embedding vectors (the same primitives the similarity ops build on).
    "q30_array_funcs" -> { (s, dir) =>
      t(s, dir, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        r6(element_at(col("embedding"), 1).cast("double")).as("first_dim"),
        array_join(sort_array(array(col("label") + 1, col("label") * 2, lit(7)))
          .cast("array<string>"), ",").as("arr_str"),
        r6(aggregate(slice(col("embedding"), 1, 8), lit(0.0),
          (acc, x) => acc + x.cast("double"))).as("sum8"),
        size(sequence(lit(1), col("label") + 1)).as("seqlen"),
        array_join(transform(sequence(lit(1), lit(3)),
          x => concat(lit("d"), x.cast("string"))), ",").as("dims"))
        .orderBy(col("vec_id"))
    },

    // Q30b: explode/posexplode (the generator surface; reference analog is
    // the per-field fan-out R5, refluxdb src/handlers.rs:113-134).
    "q30b_posexplode" -> { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 3)))
        .select(col("vec_id"), (col("pos") + 1).as("pos"),
          r6(col("col").cast("double")).as("v"))
        .orderBy(col("vec_id"), col("pos"))
    },

    // Q31: map functions over the tags-style map (SURVEY Q-C intent).
    "q31_map_funcs" -> { (s, dir) =>
      val m = map(lit("type"), col("event_type"),
        lit("uid"), col("user_id").cast("string"))
      t(s, dir, "events").select(
        col("event_id"),
        array_join(array_sort(map_keys(m)), ",").as("keys"),
        element_at(m, "type").as("etype"),
        size(m).as("n_keys"))
        .orderBy(col("event_id"))
    },
    "q31b_explode_map" -> { (s, dir) =>
      val m = map(lit("type"), col("event_type"),
        lit("uid"), col("user_id").cast("string"))
      t(s, dir, "events")
        .filter(col("event_id") < 100)
        .select(col("event_id"), explode(m).as(Seq("k", "v")))
        .orderBy(col("event_id"), col("k"))
    },

    // Q32: json functions over events.props (reference analog: tags stored
    // as a JSON string, refluxdb src/persistence.rs:113).
    "q32_json_funcs" -> { (s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_num"),
        from_json(col("props"), lit("k INT")).getField("k").as("k_struct"),
        to_json(struct(col("event_type").as("t"))).as("j"))
        .orderBy(col("event_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q27_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_type) AS lo, length(p_name) AS len,
        |  substr(p_name, 1, 5) AS sub,
        |  p_brand || '-' || p_type AS cat,
        |  lpad(p_brand, 12, '*') AS lp, rpad(p_type, 10, '#') AS rp,
        |  replace(p_name, ' ', '_') AS repl,
        |  translate(p_name, 'aeiou', 'AEIOU') AS tran,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  regexp_matches(p_name, '^[bgr]') AS starts_bgr
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q28_datetime_funcs" ->
      """SELECT o_orderkey,
        |  date_trunc('month', o_orderdate)::TIMESTAMP AS mon,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(dayofweek(o_orderdate) AS INT) AS dow,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_2000,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
        |  strftime(to_timestamp(1700000000)::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS from_unix,
        |  strptime('2024-03-0' || CAST(o_orderkey % 9 + 1 AS VARCHAR), '%Y-%m-%d') AS parsed
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q29_math_funcs" ->
      """SELECT c_custkey,
        |  abs(c_acctbal) AS abs_bal,
        |  CAST(floor(c_acctbal) AS BIGINT) AS fl,
        |  CAST(ceil(c_acctbal) AS BIGINT) AS ce,
        |  round(c_acctbal, 1) AS r1,
        |  round(c_acctbal % 97, 6) AS md,
        |  power(2.0, CAST(c_custkey % 10 AS DOUBLE)) AS pw,
        |  round(sqrt(abs(c_acctbal)), 6) AS sq,
        |  round(exp(c_acctbal / 10000), 6) AS ex,
        |  round(ln(abs(c_acctbal) + 1), 6) AS ln_,
        |  round(log10(abs(c_acctbal) + 1), 6) AS lg,
        |  CAST(sign(c_acctbal) AS INT) AS sgn
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q30_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  round(embedding[1]::DOUBLE, 6) AS first_dim,
        |  array_to_string(list_transform(list_sort([label + 1, label * 2, 7]), x -> CAST(x AS VARCHAR)), ',') AS arr_str,
        |  round(list_sum(list_transform(embedding[1:8], x -> x::DOUBLE)), 6) AS sum8,
        |  CAST(label + 1 AS INT) AS seqlen,
        |  'd1,d2,d3' AS dims
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q30b_posexplode" ->
      """SELECT vec_id, i AS pos, round(embedding[i]::DOUBLE, 6) AS v
        |FROM embeddings, (SELECT unnest([1, 2, 3]) AS i)
        |ORDER BY vec_id, pos""".stripMargin,

    "q31_map_funcs" ->
      """SELECT event_id, 'type,uid' AS keys, event_type AS etype, 2 AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,

    "q31b_explode_map" ->
      """SELECT event_id, k, v FROM (
        |  SELECT event_id, 'type' AS k, event_type AS v FROM events WHERE event_id < 100
        |  UNION ALL
        |  SELECT event_id, 'uid' AS k, CAST(user_id AS VARCHAR) AS v FROM events WHERE event_id < 100)
        |ORDER BY event_id, k""".stripMargin,

    "q32_json_funcs" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_struct,
        |  to_json(struct_pack(t := event_type))::VARCHAR AS j
        |FROM events ORDER BY event_id""".stripMargin
  )
}
