package graft.engine

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

/** The reference's four HTTP endpoints end-to-end against a live Engine. */
class ApiServerSpec extends SparkSpec {

  private def call(url: String, method: String = "GET",
      bodyStr: String = null, contentType: String = null): (Int, String) = {
    val con = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    con.setRequestMethod(method)
    if (contentType != null) con.setRequestProperty("Content-Type", contentType)
    if (bodyStr != null) {
      con.setDoOutput(true)
      con.getOutputStream.write(bodyStr.getBytes(UTF_8))
    }
    val code = con.getResponseCode
    val is = if (code < 400) con.getInputStream else con.getErrorStream
    val out = new String(is.readAllBytes(), UTF_8)
    (code, out)
  }

  test("D7 parity: /write responds with ingest counts, not the " +
      "reference's single-record echo") {
    import org.apache.spark.sql.functions.col
    val engine = new Engine(spark, tmpDir("graft-api-d7"))
    val api = new ApiServer(engine).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      // the reference echoes the one parsed measurement it saved
      // (handlers.rs:135-137); per-field fan-out means one line becomes
      // several rows and a multi-line body has no single record to echo,
      // so ours returns the saved/quarantined COUNTS (SURVEY §7.4 D7).
      // The count equals the reference's saved-record notion: 2 fields →
      // 2 rows, both visible in "ok" and in the table itself
      val (c, b) = call(s"$base/write", "POST",
        "cpu,host=a usage=0.5,nice=0.1 1700000000000000000")
      assert(c == 200 && b == """{"ok":2,"quarantined":0}""")
      assert(engine.table().filter(col("series") === "cpu").count() == 2)
    } finally api.stop()
  }

  test("write / list / range / query endpoints (E1-E3 parity)") {
    val engine = new Engine(spark, tmpDir("graft-api"))
    val api = new ApiServer(engine).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      // POST /write (R4)
      val (wc, wb) = call(s"$base/write", "POST",
        "cpu_load,host=server value=0.64 1234567891000000000\nbogus line")
      assert(wc == 200 && wb == """{"ok":1,"quarantined":1}""")

      // GET / (R9)
      val (lc, lb) = call(s"$base/")
      assert(lc == 200 && lb == """{"series":["cpu_load"]}""")

      // GET /range (R11/D2) — inclusive bounds; RFC3339 like the reference
      val (rc, rb) = call(
        s"$base/range/cpu_load?start=2009-02-13T23:31:31Z&end=2009-02-13T23:31:31Z")
      assert(rc == 200 && rb.contains("\"value\":0.64"), rb)
      // empty slice is [], not an error (D4)
      val (ec, eb) = call(
        s"$base/range/cpu_load?start=2030-01-01T00:00:00Z&end=2030-01-02T00:00:00Z")
      assert(ec == 200 && eb == "[]")
      // unknown series → 404; bad datetime → 400 (no panic, unlike ref)
      assert(call(s"$base/range/nope?start=2030-01-01T00:00:00Z&end=2030-01-01T00:00:00Z")._1 == 404)
      assert(call(s"$base/range/cpu_load?start=garbage&end=2030-01-01T00:00:00Z")._1 == 400)

      // POST /query (R12/R14) — form-encoded like the reference
      val (qc, qb) = call(s"$base/query", "POST",
        "q=SELECT%20name%2C%20value%20FROM%20cpu_load")
      assert(qc == 200 && qb == """[{"name":"value","value":0.64}]""")
      // writes rejected by the parse-based gate
      assert(call(s"$base/query", "POST", "q=DROP%20TABLE%20cpu_load")._1 == 400)

      // form body with extra params: '&pretty=true' must NOT leak into the
      // SQL (round-2 ADVICE fix — proper k/v form parsing)
      val (fc, fb) = call(s"$base/query", "POST",
        "q=SELECT%20name%2C%20value%20FROM%20cpu_load&pretty=true",
        "application/x-www-form-urlencoded")
      assert(fc == 200 && fb == """[{"name":"value","value":0.64}]""", fb)
      // raw SQL body with an explicit non-form Content-Type is verbatim —
      // even percent/plus chars must not be form-decoded
      val (tc, tb) = call(s"$base/query", "POST",
        "SELECT name, value FROM cpu_load WHERE name LIKE 'val%'",
        "text/plain")
      assert(tc == 200 && tb == """[{"name":"value","value":0.64}]""", tb)
    } finally api.stop()
  }

  test("query results stream with chunked transfer (no driver-sized " +
      "materialization) and max_rows caps in the plan") {
    val engine = new Engine(spark, tmpDir("graft-api-stream"))
    val api = new ApiServer(engine).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      val lines = (1 to 2000).map(i =>
        s"cpu,host=h$i v=$i.5 ${1700000000000000000L + i * 1000000000L}")
      engine.ingestLines(lines)
      val con = URI.create(s"$base/query").toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      con.setRequestMethod("POST")
      con.setDoOutput(true)
      con.getOutputStream.write("q=SELECT%20name%2C%20value%20FROM%20cpu"
        .getBytes(UTF_8))
      assert(con.getResponseCode == 200)
      // the response must be chunked — a Content-Length would mean the
      // whole result was materialized on the driver to measure it
      assert(con.getHeaderField("Transfer-encoding") == "chunked",
        "query results must stream, not carry Content-Length")
      assert(con.getHeaderField("Content-length") == null)
      val streamed = new String(con.getInputStream.readAllBytes(), UTF_8)
      assert(streamed.startsWith("[{") && streamed.endsWith("}]"))
      assert(streamed.split("\\},\\{").length == 2000)

      // max_rows is a plan-side limit, honored before the stream starts
      val (cc, cb) = call(s"$base/query?max_rows=7", "POST",
        "q=SELECT%20name%2C%20value%20FROM%20cpu")
      assert(cc == 200 && cb.split("\\},\\{").length == 7, cb)

      // a failing query still gets a clean error status: the first
      // partition is forced before headers commit
      val (fc, _) = call(s"$base/query", "POST",
        "q=SELECT%20name%20FROM%20no_such_series_anywhere")
      assert(fc == 400 || fc == 500)

      // an invalid cap FAILS CLOSED: the client asked for a bound, so
      // streaming the unbounded result instead would drop their guard
      for (bad <- Seq("2147483648", "0", "-5", "lots")) {
        val (bc, bb) = call(s"$base/query?max_rows=$bad", "POST",
          "q=SELECT%20name%2C%20value%20FROM%20cpu")
        assert(bc == 400 && bb.contains("max_rows"), s"$bad -> $bc $bb")
      }
    } finally api.stop()
  }

  test("explain=<mode> returns the Catalyst plan without executing, " +
      "shows the plan-side max_rows cap, and fails closed on bad modes") {
    val engine = new Engine(spark, tmpDir("graft-api-explain"))
    val api = new ApiServer(engine).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      engine.ingestLines(Seq("cpu,host=a v=1 1700000000000000000"))
      // formatted physical plan, as JSON — not result rows
      val (c1, b1) = call(s"$base/query?explain=true", "POST",
        "q=SELECT%20name%2C%20value%20FROM%20cpu%20WHERE%20value%20%3E%200")
      assert(c1 == 200 && b1.startsWith("""{"plan":"""), b1)
      assert(b1.contains("Physical Plan"), b1)
      assert(!b1.contains("\"value\":1"), "explain must not execute")
      // the value > 0 predicate must reach the parquet scan
      assert(b1.contains("PushedFilters"), b1)

      // max_rows composes: the cap is visible in the plan as a limit
      val (c2, b2) = call(s"$base/query?explain=simple&max_rows=7", "POST",
        "q=SELECT%20name%2C%20value%20FROM%20cpu")
      assert(c2 == 200 && b2.contains("Limit") && b2.contains("7"), b2)

      // /range supports it too (same plan pipeline as /query)
      val (c3, b3) = call(s"$base/range/cpu?start=2009-02-13T23:31:31Z" +
        "&end=2030-01-01T00:00:00Z&explain=extended")
      assert(c3 == 200 && b3.contains("Physical Plan"), b3)

      // malformed mode fails closed, like max_rows
      val (c4, b4) = call(s"$base/query?explain=bogus", "POST",
        "q=SELECT%20name%20FROM%20cpu")
      assert(c4 == 400 && b4.contains("explain"), s"$c4 $b4")
    } finally api.stop()
  }

  test("D8 truncation semantics under a planted execution failure: a " +
      "LATER-partition failure truncates the chunked body detectably, a " +
      "FIRST-partition failure is a clean 500") {
    import org.apache.spark.sql.functions.{col, udf}
    // failure planted by row id: ids land in deterministic range
    // partitions (0..250 in partition 0 of 4, 750+ in partition 3), and
    // toLocalIterator walks partitions in order
    def planted(failFrom: Long) = {
      val boom = udf((id: Long) => {
        if (id >= failFrom) throw new RuntimeException("planted failure")
        id
      })
      spark.range(0, 1000, 1, 4).select(boom(col("id")).as("id"))
    }
    def engineWith(failFrom: Long) =
      new Engine(spark, tmpDir("graft-api-d8")) {
        override def query(sql: String) = Right(planted(failFrom))
      }

    // (a) later partition fails: 200 + chunked already committed, the
    // body breaks mid-stream — client sees malformed JSON or an aborted
    // chunked read, NEVER a well-formed-but-short array that parses
    val api1 = new ApiServer(engineWith(750L)).start()
    try {
      val con = URI.create(s"http://127.0.0.1:${api1.boundPort}/query")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      con.setRequestMethod("POST")
      con.setDoOutput(true)
      con.getOutputStream.write("q=SELECT%201".getBytes(UTF_8))
      assert(con.getResponseCode == 200) // headers committed before fail
      assert(con.getHeaderField("Transfer-encoding") == "chunked")
      val outcome = try {
        val b = new String(con.getInputStream.readAllBytes(), UTF_8)
        if (b.startsWith("[") && b.endsWith("]")) s"well-formed: $b"
        else "truncated-json"
      } catch { case _: java.io.IOException => "aborted-chunked-read" }
      assert(outcome == "truncated-json" || outcome == "aborted-chunked-read",
        s"a mid-stream failure must be detectable, got $outcome")
    } finally api1.stop()

    // (b) first partition fails: forced BEFORE headers commit → clean 500
    // with a JSON error, no torn body
    val api2 = new ApiServer(engineWith(0L)).start()
    try {
      val (c, b) = call(s"http://127.0.0.1:${api2.boundPort}/query", "POST",
        "q=SELECT%201")
      assert(c == 500, s"first-partition failure must 500, got $c")
      assert(b.contains("\"error\"") && b.contains("internal"), b)
    } finally api2.stop()
  }

  test("timeout_ms cancels the request's job group: pre-stream expiry is " +
      "a clean 408 and the pool thread is freed; malformed values fail " +
      "closed; a generous bound streams normally") {
    import org.apache.spark.sql.functions.{col, udf}
    // rows sleeping from a given id: ids land in deterministic range
    // partitions (0..1 in partition 0 of 4), toLocalIterator walks them
    // in order, and interruptOnCancel breaks the sleep immediately
    def slow(sleepFromId: Long) = {
      val snooze = udf((id: Long) => {
        if (id >= sleepFromId) Thread.sleep(30000L)
        id
      })
      spark.range(0, 8, 1, 4).select(snooze(col("id")).as("id"))
    }
    val engine = new Engine(spark, tmpDir("graft-api-tmo")) {
      override def query(sql: String) =
        if (sql.contains("sleepy")) Right(slow(0L))
        else Right(spark.range(0, 3).toDF("id"))
    }
    val api = new ApiServer(engine).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      // (a) first partition sleeps past the bound → cancelled BEFORE
      // headers commit → crisp 408, not a hung request or a torn body
      val t0 = System.nanoTime()
      val (c1, b1) = call(s"$base/query?timeout_ms=400", "POST", "q=sleepy")
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(c1 == 408, s"expected 408, got $c1: $b1")
      assert(b1.contains("timeout_ms=400"), b1)
      assert(elapsedMs < 15000L,
        s"cancellation must interrupt the sleeping task, took ${elapsedMs}ms")
      // (b) the pool thread is free and NO job-group leak ties the next
      // request on this thread to the old cancellation
      val (c2, b2) = call(s"$base/query", "POST", "q=SELECT")
      assert(c2 == 200 && b2.startsWith("[{") && b2.endsWith("}]"), s"$c2 $b2")
      // (c) malformed timeout fails closed, like max_rows
      val (c3, b3) = call(s"$base/query?timeout_ms=abc", "POST", "q=SELECT")
      assert(c3 == 400 && b3.contains("timeout_ms"), s"$c3 $b3")
      // (d) a generous bound does not disturb a fast query
      val (c4, b4) = call(s"$base/query?timeout_ms=60000", "POST",
        "q=SELECT")
      assert(c4 == 200 && b4.startsWith("[{") && b4.endsWith("}]"), s"$c4 $b4")
    } finally api.stop()
  }

  test("a MID-STREAM timeout truncates the chunked body detectably " +
      "(the D8 semantics, now for cancellation)") {
    import org.apache.spark.sql.functions.{col, udf}
    def slowTail() = {
      val snooze = udf((id: Long) => {
        if (id >= 6) Thread.sleep(30000L) // partition 3 of 4 only
        id
      })
      spark.range(0, 8, 1, 4).select(snooze(col("id")).as("id"))
    }
    val engine = new Engine(spark, tmpDir("graft-api-tmo2")) {
      override def query(sql: String) = Right(slowTail())
    }
    val api = new ApiServer(engine).start()
    try {
      val con = URI.create(
        s"http://127.0.0.1:${api.boundPort}/query?timeout_ms=3000")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      con.setRequestMethod("POST")
      con.setDoOutput(true)
      con.getOutputStream.write("q=whatever".getBytes(UTF_8))
      // early partitions normally execute well inside the bound →
      // headers commit and the cancel can only truncate. On a badly
      // contended box the FIRST partition can lose the race too — that
      // legitimate outcome is the other test's 408 path, not a failure
      // here, so it only downgrades this run to the pre-stream case.
      val code = con.getResponseCode
      if (code == 200) {
        assert(con.getHeaderField("Transfer-encoding") == "chunked")
        val outcome = try {
          val b = new String(con.getInputStream.readAllBytes(), UTF_8)
          if (b.startsWith("[") && b.endsWith("]")) s"well-formed: $b"
          else "truncated-json"
        } catch { case _: java.io.IOException => "aborted-chunked-read" }
        assert(outcome == "truncated-json" ||
          outcome == "aborted-chunked-read",
          s"a mid-stream timeout must be detectable, got $outcome")
      } else {
        info("first partition lost the race: pre-stream 408 path")
        assert(code == 408, s"expected 200-then-truncation or 408, got $code")
      }
    } finally api.stop()
  }

  test("GET /fields lists field keys with their carried value types " +
      "(SHOW FIELD KEYS analog), per series and globally") {
    val engine = new Engine(spark, tmpDir("graft-api-fields"))
    engine.ingestLines(Seq(
      "cpu,host=h1 usage=0.5,cores=8i 1700000000000000000",
      "cpu,host=h2 usage=0.7,label=\"hot\" 1700000001000000000",
      "disk,host=h1 free=0.9,mounted=true 1700000002000000000"))
    val api = new ApiServer(engine).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      val (c1, b1) = call(s"$base/fields")
      assert(c1 == 200, b1)
      assert(b1.contains("""{"field":"cores","types":["integer"]}"""), b1)
      assert(b1.contains("""{"field":"usage","types":["float"]}"""), b1)
      assert(b1.contains("""{"field":"label","types":["string"]}"""), b1)
      assert(b1.contains("""{"field":"mounted","types":["boolean"]}"""), b1)
      val (c2, b2) = call(s"$base/fields/disk")
      assert(c2 == 200 && b2.contains("free") && b2.contains("mounted") &&
        !b2.contains("usage"), s"$c2 $b2")
      val (c3, _) = call(s"$base/fields/nope")
      assert(c3 == 404)
    } finally api.stop()
  }

  test("GET /cardinality reports series / field-key / per-tag-key " +
      "distinct counts (SHOW CARDINALITY analog)") {
    val engine = new Engine(spark, tmpDir("graft-api-cardinality"))
    engine.ingestLines(Seq(
      "cpu,host=h1,dc=east usage=0.5 1700000000000000000",
      "cpu,host=h2,dc=east usage=0.7 1700000001000000000",
      "disk,host=h1 free=0.9,inodes=12i 1700000002000000000"))
    val api = new ApiServer(engine).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      val (c, b) = call(s"$base/cardinality")
      assert(c == 200, b)
      // 2 series; 3 field keys (usage, free, inodes); host has 2 values,
      // dc has 1 — the runaway-tag alarm numbers, exact
      assert(b.contains("""{"kind":"series","key":"","n":2}"""), b)
      assert(b.contains("""{"kind":"field_key","key":"","n":3}"""), b)
      assert(b.contains("""{"kind":"tag_values","key":"dc","n":1}"""), b)
      assert(b.contains("""{"kind":"tag_values","key":"host","n":2}"""), b)
      val (c404, _) = call(s"$base/cardinality/extra")
      assert(c404 == 404)
    } finally api.stop()
  }

  test("GET /skew serves the per-tag-key concentration advisory (exact " +
      "Gini + top shares via the shared q_skew_profile formula), 404s " +
      "unknown series") {
    val engine = new Engine(spark, tmpDir("graft-api-skew"))
    // host: h1×3, h2×1 — n=2 values over T=4 rows: sorted counts (1,3),
    // S = 1·1 + 3·2 = 7, Gini = (2·7 − 3·4)/(2·4) = 2/8 = 0.25;
    // dc: east×4 — single value, Gini 0 with top-1 share 1.0 (the hot
    // tag /cardinality's ndv cannot flag)
    engine.ingestLines(Seq(
      "cpu,host=h1,dc=east usage=0.5 1700000000000000000",
      "cpu,host=h1,dc=east usage=0.6 1700000001000000000",
      "cpu,host=h1,dc=east usage=0.7 1700000002000000000",
      "cpu,host=h2,dc=east usage=0.8 1700000003000000000"))
    val api = new ApiServer(engine).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      val (c, b) = call(s"$base/skew/cpu")
      assert(c == 200, b)
      assert(b.contains("""{"tag":"dc","n_values":1,"n_rows":4,""" +
        """"max_count":4,"top1_share_micro":1000000,""" +
        """"top10_share_micro":1000000,"gini_micro":0}"""), b)
      assert(b.contains("""{"tag":"host","n_values":2,"n_rows":4,""" +
        """"max_count":3,"top1_share_micro":750000,""" +
        """"top10_share_micro":1000000,"gini_micro":250000}"""), b)
      val (c404, _) = call(s"$base/skew/nope")
      assert(c404 == 404)
      val (c400, _) = call(s"$base/skew/")
      assert(c400 == 400)
    } finally api.stop()
  }

  test("GET /profile serves the per-field column profile with day-range " +
      "pruning and fail-closed validation") {
    val engine = new Engine(spark, tmpDir("graft-api-profile"))
    engine.ingestLines(Seq(
      // 2023-11-14 (epoch 1700000000): two typed fields + a string field
      "cpu,host=h1 usage=0.5,cores=8i 1700000000000000000",
      "cpu,host=h2 usage=0.9,label=\"hot\" 1700000001000000000",
      // next day: usage only — the day range must exclude it
      "cpu,host=h1 usage=0.7 1700090000000000000"))
    val api = new ApiServer(engine).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      val (c1, b1) = call(s"$base/profile/cpu")
      assert(c1 == 200, b1)
      // usage: 3 float rows, min/max across both days
      assert(b1.contains(""""field":"usage","n":3,"n_float":3,"n_int":0"""),
        b1)
      assert(b1.contains(""""min_num":0.5""") &&
        b1.contains(""""max_num":0.9"""), b1)
      // cores: integer-typed; label: string-typed with null numeric range
      assert(b1.contains(""""field":"cores","n":1,"n_float":0,"n_int":1"""),
        b1)
      assert(
        """"field":"label","n":1,.*"n_str":1,.*"min_num":null""".r
          .findFirstIn(b1).isDefined, b1)
      // day bound excludes the second day's usage row
      val (c2, b2) = call(s"$base/profile/cpu?from=2023-11-14&to=2023-11-14")
      assert(c2 == 200 &&
        b2.contains(""""field":"usage","n":2"""), s"$c2 $b2")
      // validation: unknown series 404, malformed day 400
      assert(call(s"$base/profile/nope")._1 == 404)
      assert(call(s"$base/profile/cpu?from=14-11-2023")._1 == 400)
    } finally api.stop()
  }

  test("GET /trend serves the OLS fit with hand-derived values and " +
      "fail-closed validation") {
    val engine = new Engine(spark, tmpDir("graft-api-trend"))
    // v = 1.00 + 0.10/s on the dot: cents 100, 200, 300 at 10 s steps
    val base = 1700000000000000000L
    engine.ingestLines(Seq(
      s"trend,host=a v=1.0 $base",
      s"trend,host=a v=2.0 ${base + 10000000000L}",
      s"trend,host=a v=3.0 ${base + 20000000000L}",
      // a second field with two SIMULTANEOUS points: den = 0 → undetermined
      s"trend,host=a flat=5.0 $base",
      s"trend,host=b flat=6.0 $base"))
    val api = new ApiServer(engine).start()
    val url = s"http://127.0.0.1:${api.boundPort}"
    try {
      val (c1, b1) = call(s"$url/trend/trend?name=v")
      assert(c1 == 200, b1)
      // slope 10 cents/s → 10,000,000 micro; predict(+3600 s past t=20)
      // = 100 + 10·3620 = 36,300 cents → 36,300,000,000 micro
      assert(b1.contains("\"n\":3") && b1.contains("\"determined\":true") &&
        b1.contains("\"deriv_micro\":10000000") &&
        b1.contains("\"predict_1h_micro\":36300000000"), b1)
      // simultaneous points: fit undetermined, not an error
      val (c2, b2) = call(s"$url/trend/trend?name=flat")
      assert(c2 == 200 && b2.contains("\"determined\":false"), s"$c2 $b2")
      // day bounds prune (empty range → n=0 undetermined)
      val (c3, b3) = call(
        s"$url/trend/trend?name=v&from=1999-01-01&to=1999-01-02")
      assert(c3 == 200 && b3.contains("\"n\":0") &&
        b3.contains("\"determined\":false"), s"$c3 $b3")
      // validation fails closed
      assert(call(s"$url/trend/trend?name=v&from=14-11-2023")._1 == 400)
      assert(call(s"$url/trend/trend")._1 == 400)
      assert(call(s"$url/trend/nope?name=v")._1 == 404)
    } finally api.stop()
  }

  test("GET /changepoint serves the binary-segmentation split with " +
      "hand-derived values and fail-closed validation") {
    val engine = new Engine(spark, tmpDir("graft-api-changepoint"))
    // level shift 1.0 → 5.0 after the third point: cents 100,100,100,
    // 500,500; scores |5·S_t − t·1300| = 800,1600,2400,1200 → split at
    // t=3 with score 2400, means 100 / 500 cents
    val base = 1700000000000000000L
    engine.ingestLines(Seq(
      s"cp,host=a v=1.0 $base",
      s"cp,host=a v=1.0 ${base + 10000000000L}",
      s"cp,host=a v=1.0 ${base + 20000000000L}",
      s"cp,host=a v=5.0 ${base + 30000000000L}",
      s"cp,host=a v=5.0 ${base + 40000000000L}",
      // a single-point field: no valid split → determined:false
      s"cp,host=a lone=7.0 $base"))
    val api = new ApiServer(engine).start()
    val url = s"http://127.0.0.1:${api.boundPort}"
    try {
      val (c1, b1) = call(s"$url/changepoint/cp?name=v")
      assert(c1 == 200, b1)
      assert(b1.contains("\"n\":5") && b1.contains("\"determined\":true") &&
        b1.contains(s""""changepoint_us":${base / 1000 + 20000000L}""") &&
        b1.contains("\"score\":2400") &&
        b1.contains("\"mean_left_micro\":1000000") &&
        b1.contains("\"mean_right_micro\":5000000"), b1)
      val (c2, b2) = call(s"$url/changepoint/cp?name=lone")
      assert(c2 == 200 && b2.contains("\"determined\":false"), s"$c2 $b2")
      // validation fails closed
      assert(call(s"$url/changepoint/cp?name=v&from=14-11-2023")._1 == 400)
      assert(call(s"$url/changepoint/cp")._1 == 400)
      assert(call(s"$url/changepoint/nope?name=v")._1 == 404)
    } finally api.stop()
  }

  test("GET /correlate finds co-moving series with hand-derived r and " +
      "fail-closed validation") {
    val engine = new Engine(spark, tmpDir("graft-api-correlate"))
    val h = 3600000000000L // one hour in ns
    val base = 1700000000000000000L
    // cpu rises 1,2,3 across three hours; load doubles it (r = +1);
    // inv mirrors it (r = −1); blip has only 2 common hours → dropped
    engine.ingestLines(Seq(
      s"cpu,host=a v=1.0 $base",
      s"cpu,host=a v=2.0 ${base + h}",
      s"cpu,host=a v=3.0 ${base + 2 * h}",
      s"load,host=a v=2.0 $base",
      s"load,host=a v=4.0 ${base + h}",
      s"load,host=a v=6.0 ${base + 2 * h}",
      s"inv,host=a v=3.0 $base",
      s"inv,host=a v=2.0 ${base + h}",
      s"inv,host=a v=1.0 ${base + 2 * h}",
      s"blip,host=a v=9.0 $base",
      s"blip,host=a v=1.0 ${base + h}"))
    val api = new ApiServer(engine).start()
    val url = s"http://127.0.0.1:${api.boundPort}"
    try {
      val (c1, b1) = call(s"$url/correlate/cpu?name=v")
      assert(c1 == 200, b1)
      assert(b1.contains(""""series":"load","r":1.0,"n_hours":3""") &&
        b1.contains(""""series":"inv","r":-1.0,"n_hours":3"""), b1)
      assert(!b1.contains("blip"), b1) // < 3 common hours
      // k caps the list
      val (c2, b2) = call(s"$url/correlate/cpu?name=v&k=1")
      assert(c2 == 200 && b2.contains("inv") && !b2.contains("load"),
        s"$c2 $b2") // |r| tie → series-name tiebreak
      // validation fails closed
      assert(call(s"$url/correlate/cpu?name=v&k=0")._1 == 400)
      assert(call(s"$url/correlate/cpu")._1 == 400)
      assert(call(s"$url/correlate/nope?name=v")._1 == 404)
    } finally api.stop()
  }

  test("GET /overlap serves sketch set-algebra between two series with " +
      "fail-closed validation") {
    val engine = new Engine(spark, tmpDir("graft-api-overlap"))
    // hosts a,b,c on cpu; b,c,d on mem → overlap 2 of union 4
    engine.ingestLines(Seq(
      "cpu,host=a v=1 1700000000000000000",
      "cpu,host=b v=2 1700000001000000000",
      "cpu,host=c v=3 1700000002000000000",
      "mem,host=b v=4 1700000003000000000",
      "mem,host=c v=5 1700000004000000000",
      "mem,host=d v=6 1700000005000000000"))
    engine.sketchRollup()
    val api = new ApiServer(engine).start()
    val url = s"http://127.0.0.1:${api.boundPort}"
    try {
      val (c1, b1) = call(
        s"$url/overlap/cpu/mem?from=2023-11-14&to=2023-11-14")
      assert(c1 == 200, b1)
      assert(b1.contains("\"tagsets_a\":3") &&
        b1.contains("\"tagsets_b\":3") &&
        b1.contains("\"tagsets_union\":4") &&
        b1.contains("\"approx_overlap\":2"), b1)
      // validation fails closed: bad day, missing series, bad method
      assert(call(
        s"$url/overlap/cpu/mem?from=14-11-2023&to=2023-11-14")._1 == 400)
      assert(call(
        s"$url/overlap/cpu/nope?from=2023-11-14&to=2023-11-14")._1 == 404)
      assert(call(s"$url/overlap/cpu?from=2023-11-14&to=2023-11-14")
        ._1 == 400)
    } finally api.stop()
  }

  test("GET /quantiles serves percentiles from the histogram rollup " +
      "with fail-closed parameter validation") {
    val engine = new Engine(spark, tmpDir("graft-api-quant"))
    engine.ingestLines((1 to 100).map(v =>
      s"lat,host=a v=$v.0 ${1700000000000000000L + v * 1000000000L}"))
    engine.histogramRollup()
    val api = new ApiServer(engine).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      val (c1, b1) = call(
        s"$base/quantiles/lat?name=v&from=2023-11-14&to=2023-11-14&q=0.5,0.99")
      assert(c1 == 200, b1)
      assert(b1.contains("\"quantile\":0.5") && b1.contains("\"n_rows\":100"),
        b1)
      // p50 of 1..100 from 1%-wide bins: within 1% of 50
      val p50 = """"quantile":0.5,"approx_value":([0-9.]+)""".r
        .findFirstMatchIn(b1).get.group(1).toDouble
      assert(math.abs(p50 - 50.0) / 50.0 <= 0.01, s"p50=$p50")
      // validation fails closed: bad quantile, missing params, bad days
      assert(call(s"$base/quantiles/lat?name=v&from=2023-11-14&to=2023-11-14&q=1.5")._1 == 400)
      assert(call(s"$base/quantiles/lat?name=v&from=2023-11-14&to=2023-11-14&q=abc")._1 == 400)
      assert(call(s"$base/quantiles/lat?from=2023-11-14&to=2023-11-14")._1 == 400)
      assert(call(s"$base/quantiles/lat?name=v&from=14-11-2023&to=2023-11-14")._1 == 400)
      assert(call(s"$base/quantiles/nope?name=v&from=2023-11-14&to=2023-11-14")._1 == 404)
      // empty day range → empty list, not an error (D4 posture)
      val (ce, be) = call(
        s"$base/quantiles/lat?name=v&from=1999-01-01&to=1999-01-02")
      assert(ce == 200 && be == """{"quantiles":[]}""", s"$ce $be")
    } finally api.stop()
  }

  test("timeout_ms=0 opts out of a server-wide default bound") {
    import org.apache.spark.sql.functions.{col, udf}
    def nap() = {
      val z = udf((id: Long) => { Thread.sleep(1200L); id })
      spark.range(0, 1, 1, 1).select(z(col("id")).as("id"))
    }
    val engine = new Engine(spark, tmpDir("graft-api-tmo0")) {
      override def query(sql: String) = Right(nap())
    }
    val api = new ApiServer(engine, defaultQueryTimeoutMs = 300).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      // the server default applies when the client says nothing
      val (c1, b1) = call(s"$base/query", "POST", "q=x")
      assert(c1 == 408 && b1.contains("timeout_ms=300"), s"$c1 $b1")
      // an EXPLICIT 0 is the documented unbounded opt-out, not a 400
      val (c2, b2) = call(s"$base/query?timeout_ms=0", "POST", "q=x")
      assert(c2 == 200 && b2 == """[{"id":0}]""", s"$c2 $b2")
    } finally api.stop()
  }

  test("GET /jobs observes running queries and DELETE /jobs/<id> cancels " +
      "exactly one: the victim gets the reason, others run on") {
    import org.apache.spark.sql.functions.{col, udf}
    def slow() = {
      val snooze = udf((id: Long) => { Thread.sleep(30000L); id })
      spark.range(0, 8, 1, 4).select(snooze(col("id")).as("id"))
    }
    val engine = new Engine(spark, tmpDir("graft-api-jobs")) {
      override def query(sql: String) =
        if (sql.contains("sleepy")) Right(slow())
        else Right(spark.range(0, 3).toDF("id"))
    }
    val api = new ApiServer(engine).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      // fire the victim from a background thread; it will block pre-stream
      val victim = new java.util.concurrent.CompletableFuture[(Int, String)]()
      val t = new Thread(() =>
        victim.complete(call(s"$base/query", "POST", "q=sleepy")))
      t.setDaemon(true); t.start()

      // the job list must show it (with its SQL) once the handler is in
      var jobs = ""
      val deadline = System.nanoTime() + 15000000000L
      while (!jobs.contains("sleepy") && System.nanoTime() < deadline) {
        Thread.sleep(100); jobs = call(s"$base/jobs")._2
      }
      assert(jobs.contains("\"query\":\"sleepy\""), s"job not listed: $jobs")
      assert(jobs.contains("\"elapsed_ms\":"), jobs)
      val id = "\"id\":\"(\\d+)\"".r.findFirstMatchIn(jobs).get.group(1)

      // unknown ids 404; cancelling the real one answers immediately
      assert(call(s"$base/jobs/99999", "DELETE")._1 == 404)
      val (cc, cb) = call(s"$base/jobs/$id", "DELETE")
      assert(cc == 200 && cb.contains(s""""cancelled":"$id""""), s"$cc $cb")

      // the victim unblocks promptly with the cancellation reason (it had
      // streamed nothing, so a clean 408 — not a 30 s hang, not a 500)
      val (vc, vb) = victim.get(15, java.util.concurrent.TimeUnit.SECONDS)
      assert(vc == 408, s"victim got $vc: $vb")
      assert(vb.contains("cancelled by client"), vb)

      // the entry is gone and the server still serves other queries
      assert(!call(s"$base/jobs")._2.contains("sleepy"))
      val (c2, b2) = call(s"$base/query", "POST", "q=SELECT")
      assert(c2 == 200 && b2.startsWith("[{"), s"$c2 $b2")
    } finally api.stop()
  }

  test("retention and DROP SERIES endpoints (superset: the reference has " +
      "no delete path)") {
    val engine = new Engine(spark, tmpDir("graft-api-del"))
    val api = new ApiServer(engine).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      call(s"$base/write", "POST",
        "old v=1.0 1234567890000000000\n" + // 2009-02-13
          "old v=2.0 1700000000000000000\n" + // 2023-11-14
          "fresh v=3.0 1700000000000000000")
      // expire everything before 2023: one day partition of 'old' goes
      val (rc, rb) = call(s"$base/retention?before=2023-01-01", "POST")
      assert(rc == 200 && rb == """{"dropped_partitions":1}""", rb)
      assert(engine.table().count() == 2)
      // malformed cutoff → 400, not a panic
      assert(call(s"$base/retention?before=nope", "POST")._1 == 400)
      assert(call(s"$base/retention", "POST")._1 == 400)

      // GET /tags and /tags/<key> (SHOW TAG KEYS / VALUES)
      call(s"$base/write", "POST",
        "tagged,host=web1,region=eu v=1.0 1700000000000000000")
      assert(call(s"$base/tags")._2 == """{"keys":["host","region"]}""")
      assert(call(s"$base/tags/host")._2 == """{"values":["web1"]}""")
      assert(call(s"$base/tags/none")._2 == """{"values":[]}""")
      assert(call(s"$base/tags", "POST")._1 == 405)
      // prefix-matched junk is 404, not an empty success
      assert(call(s"$base/tags/host/extra")._1 == 404)
      assert(call(s"$base/tagsfoo")._1 == 404)
      // raw-path decode happens exactly ONCE: %25 is a literal '%'
      assert(call(s"$base/tags/disk%25used")._2 == """{"values":[]}""")

      // DELETE /series/<name>
      val (dc, db) = call(s"$base/series/old", "DELETE")
      assert(dc == 200 && db == """{"dropped":"old"}""", db)
      assert(call(s"$base/")._2 == """{"series":["fresh","tagged"]}""")
      assert(call(s"$base/series/old", "DELETE")._1 == 404) // already gone
      assert(call(s"$base/series/old", "GET")._1 == 405) // wrong method
    } finally api.stop()
  }

  test("POST /merge applies line-protocol corrections transactionally " +
      "(U upserts, D deletes by field+timestamp; any bad line rejects " +
      "the whole batch before disk is touched)") {
    import org.apache.spark.sql.functions._
    val engine = new Engine(spark, tmpDir("graft-api-merge"))
    val t1 = 1700000000000000000L
    engine.ingestLines(Seq(
      s"cpu,host=a v=1.0,w=2.0 $t1",
      s"mem,host=b used=5.0 $t1"))
    val api = new ApiServer(engine).start()
    val url = s"http://127.0.0.1:${api.boundPort}"
    try {
      // U matched (update cpu.v), U unmatched (insert cpu.z),
      // D matched (delete mem.used) — one batch, one response
      val (c1, b1) = call(s"$url/merge", "POST",
        s"cpu,adj=y v=9.5,z=7.0 $t1\nmem used=0 $t1"
          .split("\n").map(l => if (l.startsWith("mem")) s"D $l" else s"U $l")
          .mkString("\n"))
      assert(c1 == 200, s"$c1 $b1")
      assert(b1.contains(""""updated":1""") &&
        b1.contains(""""inserted":1""") &&
        b1.contains(""""deleted":1""") &&
        b1.contains(""""kept":1"""), b1) // cpu.w untouched
      val state = engine.table()
        .select(col("series"), col("name"), col("value"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getDouble(2))).toSet
      assert(state == Set(("cpu", "v", 9.5), ("cpu", "w", 2.0),
        ("cpu", "z", 7.0)), s"post-merge state: $state")
      // the update REPLACED tags (adj=y)
      assert(engine.table().filter(col("name") === "v")
        .select(col("tags")).head()
        .getAs[Map[String, String]](0) == Map("adj" -> "y"))
      // transactional reject: one bad line (no timestamp) → 400, and
      // the good line did NOT apply
      val before = engine.table().count()
      val (c2, b2) = call(s"$url/merge", "POST",
        s"U cpu v=111 $t1\nU cpu w=3.3")
      assert(c2 == 400 && b2.contains("timestamp"), s"$c2 $b2")
      assert(engine.table().count() == before)
      assert(engine.table().filter(col("name") === "v")
        .select(col("value")).head().getDouble(0) == 9.5)
      // validation: bad prefix, empty body, wrong method
      assert(call(s"$url/merge", "POST", s"X cpu v=1 $t1")._1 == 400)
      assert(call(s"$url/merge", "POST", "")._1 == 400)
      assert(call(s"$url/merge")._1 == 405)
    } finally api.stop()
  }

  test("GET /views lists the IncrementalRollup registry and serves each " +
      "view's maintained readout (store + delta ≡ recompute), failing " +
      "closed without a configured views directory") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val engine = new Engine(spark, tmpDir("graft-api-views"))
    val api = new ApiServer(engine, viewsDir = Some(dir)).start()
    val url = s"http://127.0.0.1:${api.boundPort}"
    try {
      // registry listing: all three registered views, with their shapes
      val (lc, lb) = call(s"$url/views")
      assert(lc == 200, lb)
      for (v <- Seq("nation_revenue", "hourly_activity", "source_tokens"))
        assert(lb.contains(s""""name":"$v""""), lb)
      assert(lb.contains(""""source":"documents.parquet""""), lb)
      assert(lb.contains(""""group_keys":["event_type","hr"]"""), lb)
      // the served readout equals the full recompute (the oracle-gated
      // q_ivm_tokens equivalence, read over HTTP)
      val (vc, vb) = call(s"$url/views/source_tokens")
      assert(vc == 200, vb)
      val want = graft.Tables.load(spark, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(expr("filter(split(text, ' '), w -> length(w) > 0)"))
            .cast("long")).as("tokens_total"))
        .collect()
        .map(r => s""""source":${"\"" + r.getString(0) + "\""},""" +
          s""""n_docs":${r.getLong(1)},"tokens_total":${r.getLong(2)}""")
      assert(want.nonEmpty)
      want.foreach(row => assert(vb.contains(row), s"missing $row in $vb"))
      // validation
      assert(call(s"$url/views/nope")._1 == 404)
      assert(call(s"$url/views", "POST", "")._1 == 405)
      // a server with NO views directory: listing still works, per-view
      // serving says why it cannot (409), not an empty result
      val bare = new ApiServer(engine).start()
      try {
        assert(call(s"http://127.0.0.1:${bare.boundPort}/views")._1 == 200)
        val (nc, nb) =
          call(s"http://127.0.0.1:${bare.boundPort}/views/source_tokens")
        assert(nc == 409 && nb.contains("configured"), s"$nc $nb")
      } finally bare.stop()
    } finally api.stop()
  }

  test("GET /search serves BM25 top-k from the PERSISTED postings store " +
      "with hand-derived scores, no fact scan at request time, and " +
      "fail-closed validation") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val engine = new Engine(spark, tmpDir("graft-api-search"))
    val base = 1700000000000000000L
    // three 2-token docs (equal dl ⇒ dl·N/sum_dl = 1, so by hand:
    // tfc = tf·2.2/(tf+1.2) → 1.0 at tf=1, 1.375 at tf=2;
    // idf(df=2) = ln(1.6) = 0.470004 micro (half-up), idf(df=1) =
    // ln(8/3) = 0.980829 micro):
    //   sa: "alpha beta"  sb: "alpha alpha"  sc: "beta gamma"
    engine.ingestLines(Seq(
      s"""sa doc="alpha beta" $base""",
      s"""sb doc="alpha alpha" ${base + 1000000000L}""",
      s"""sc doc="beta gamma" ${base + 2000000000L}"""))
    val api = new ApiServer(engine).start()
    val url = s"http://127.0.0.1:${api.boundPort}"
    try {
      // before any build: 409 with the rebuild hint
      val (c0, b0) = call(s"$url/search?q=alpha")
      assert(c0 == 409 && b0.contains("rebuild"), s"$c0 $b0")
      assert(call(s"$url/search/rebuild", "POST", "")._1 == 200)
      // one term: tf decides — sb (tf=2 → 646255) over sa (tf=1 → 470004)
      val (c1, b1) = call(s"$url/search?q=alpha")
      assert(c1 == 200, b1)
      assert(b1.indexOf(""""series":"sb"""") >= 0 &&
        b1.indexOf(""""series":"sb"""") < b1.indexOf(""""series":"sa""""),
        b1)
      assert(b1.contains(""""score_micro":646255""") &&
        b1.contains(""""score_micro":470004"""), b1)
      assert(!b1.contains("\"series\":\"sc\""), b1)
      // two terms: sa hits both (940008) over sb (646255) and sc (470004)
      val (c2, b2) = call(s"$url/search?q=alpha+beta")
      assert(c2 == 200, b2)
      assert(b2.contains(""""series":"sa","name":"doc","time_us":""" +
        s"""${base / 1000},"n_terms_hit":2,"score_micro":940008"""), b2)
      assert(b2.indexOf(""""series":"sa"""") <
        b2.indexOf(""""series":"sb"""") &&
        b2.indexOf(""""series":"sb"""") < b2.indexOf(""""series":"sc""""),
        b2)
      // rare term scores idf(df=1): gamma → sc at 980829
      val (c3, b3) = call(s"$url/search?q=gamma")
      assert(c3 == 200 && b3.contains(""""score_micro":980829""") &&
        !b3.contains("\"series\":\"sa\""), b3)
      // k truncates
      val (c4, b4) = call(s"$url/search?q=alpha&k=1")
      assert(c4 == 200 && b4.contains("\"series\":\"sb\"") &&
        !b4.contains("\"series\":\"sa\""), b4)
      // no match: empty hits, not an error (D4)
      val (c5, b5) = call(s"$url/search?q=zzz")
      assert(c5 == 200 && b5.contains(""""hits":[]"""), s"$c5 $b5")
      // validation fails closed
      assert(call(s"$url/search")._1 == 400)
      assert(call(s"$url/search?q=alpha&k=0")._1 == 400)
      assert(call(s"$url/search?q=alpha&k=101")._1 == 400)
      assert(call(s"$url/search?q=alpha", "POST", "")._1 == 405)
      assert(call(s"$url/search/xyz")._1 == 404)
      // THE POINT of persisting the postings: the serving plan reads
      // ONLY the store (pruned to the terms' hash buckets) — the
      // measurements fact table is never scanned at request time
      val q = engine.searchFrame(Seq("alpha"), 5)
      val scans = q.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "no file scan in the serving plan")
      assert(scans.forall(_.relation.location.rootPaths.forall(
        _.toString.contains("search_index"))),
        s"serving plan scans beyond the persisted postings:\n$q")
      assert(scans.head.partitionFilters.nonEmpty,
        s"term buckets did not become a partition filter:\n${scans.head}")
    } finally api.stop()
  }

  test("GET /search scope params (series/from/to) filter candidates " +
      "with GLOBAL scores over the wire; bad scopes 400; the fail-closed " +
      "stale mode serves 409-with-refresh-hint instead of the corpus " +
      "fallback (round-15 VERDICT #3/#5)") {
    val engine = new Engine(spark, tmpDir("graft-api-search-scope"))
    val base = 1700000000000000000L
    engine.ingestLines(Seq(
      s"""sa doc="alpha beta" $base""",
      s"""sb doc="alpha alpha" ${base + 1000000000L}""",
      s"""sc doc="beta gamma" ${base + 2000000000L}"""))
    val api = new ApiServer(engine).start()
    val url = s"http://127.0.0.1:${api.boundPort}"
    try {
      assert(call(s"$url/search/rebuild", "POST", "")._1 == 200)
      val score = (body: String, series: String) => {
        val re = ("\"series\":\"" + series +
          "\"[^}]*\"score_micro\":(-?\\d+)").r
        re.findFirstMatchIn(body).map(_.group(1).toLong)
      }
      val (cu, bu) = call(s"$url/search?q=alpha")
      assert(cu == 200 && score(bu, "sa").nonEmpty, bu)
      // series scope: only sa ranks, and its score is IDENTICAL to the
      // unscoped read — a filter, not a per-scope re-weighting
      val (ca, ba) = call(s"$url/search?q=alpha&series=sa")
      assert(ca == 200 && !ba.contains("\"series\":\"sb\""), ba)
      assert(score(ba, "sa") == score(bu, "sa"),
        s"scoped score diverged: $ba vs $bu")
      // time scope: from just past sa's µs timestamp excludes sa only
      val t0 = base / 1000L
      val (ct, bt) = call(s"$url/search?q=alpha&from=${t0 + 1}")
      assert(ct == 200 && !bt.contains("\"series\":\"sa\"") &&
        bt.contains("\"series\":\"sb\""), bt)
      assert(score(bt, "sb") == score(bu, "sb"),
        s"time-scoped score diverged: $bt vs $bu")
      // validation: non-numeric bounds and scope-with-mmr reject
      assert(call(s"$url/search?q=alpha&from=abc")._1 == 400)
      assert(call(s"$url/search?q=alpha&to=2024-01-01")._1 == 400)
      assert(call(s"$url/search?q=alpha&rerank=mmr&series=sa")._1 == 400)
      // default stale posture: the corpus-priced fallback serves (200)
      assert(call(s"$url/write", "POST",
        s"""sd doc="omega" ${base + 3000000000L}""")._1 == 200)
      assert(call(s"$url/search?q=alpha")._1 == 200)
      // fail-closed mode: the same stale read now 409s with the hint
      engine.searchFailWhenStale = true
      val (cx, bx) = call(s"$url/search?q=alpha")
      assert(cx == 409 && bx.contains("refresh"), s"$cx $bx")
      // refresh restores serving under the same mode
      assert(call(s"$url/search/refresh", "POST", "")._1 == 200)
      val (cy, by2) = call(s"$url/search?q=omega")
      assert(cy == 200 && by2.contains("\"series\":\"sd\""), by2)
      engine.searchFailWhenStale = false
    } finally api.stop()
  }

  test("GET /search?rerank=mmr diversifies via the forward index: the " +
      "duplicate of an already-chosen doc is demoted below a fresh doc " +
      "(hand-derived greedy gains), k caps at the pool bound") {
    val engine = new Engine(spark, tmpDir("graft-api-mmr"))
    val base = 1700000000000000000L
    // three 2-token docs, query "alpha" matches all at equal rel
    // (df=3, N=3 ⇒ idf = ln(8/7) → 133531 micro; dl·N/sum_dl = 1):
    //   s1: "alpha beta"  s2: "alpha beta" (exact dup)  s3: "alpha gamma"
    // greedy: rk1 = s1 (pool order on ties), gain 7·133531 = 934717;
    // rk2: s2 gain = 934717 − 3·1000000 (identical sets) = −2065283,
    //      s3 gain = 934717 − 3·333333 (1-of-3 Jaccard)  =   −65282
    //      → s3 WINS: the duplicate is demoted; rk3 = s2
    engine.ingestLines(Seq(
      s"""s1 doc="alpha beta" $base""",
      s"""s2 doc="alpha beta" ${base + 1000000000L}""",
      s"""s3 doc="alpha gamma" ${base + 2000000000L}"""))
    val api = new ApiServer(engine).start()
    val url = s"http://127.0.0.1:${api.boundPort}"
    try {
      assert(call(s"$url/search/rebuild", "POST", "")._1 == 200)
      // plain BM25 order: pool tie-break ranks the duplicate (s2) 2nd
      val (c0, b0) = call(s"$url/search?q=alpha")
      assert(c0 == 200 && b0.indexOf(""""series":"s2"""") <
        b0.indexOf(""""series":"s3""""), b0)
      // MMR flips it: s1, s3, s2 — with the exact hand-derived gains
      val (c1, b1) = call(s"$url/search?q=alpha&rerank=mmr&k=3")
      assert(c1 == 200, b1)
      assert(b1.contains(""""rank":1,"series":"s1","name":"doc",""" +
        s""""time_us":${base / 1000},"rel_micro":133531,""" +
        """"mmr_gain":934717"""), b1)
      assert(b1.contains(""""rank":2,"series":"s3"""") &&
        b1.contains(""""mmr_gain":-65282"""), b1)
      assert(b1.contains(""""rank":3,"series":"s2"""") &&
        b1.contains(""""mmr_gain":-2065283"""), b1)
      // k truncates the greedy emission
      val (c2, b2) = call(s"$url/search?q=alpha&rerank=mmr&k=2")
      assert(c2 == 200 && !b2.contains(""""series":"s2""""), b2)
      // validation: bad rerank value; k over the 20-doc pool bound
      assert(call(s"$url/search?q=alpha&rerank=xyz")._1 == 400)
      assert(call(s"$url/search?q=alpha&rerank=mmr&k=21")._1 == 400)
    } finally api.stop()
  }

  test("POST /merge and GET /search stay consistent over the wire " +
      "(round-14 VERDICT #1): a corrected doc ranks under its NEW text, " +
      "a deleted doc stops answering, /write makes the store stale but " +
      "the fallback still serves the new doc, POST /search/refresh " +
      "restores the store-only plan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val engine = new Engine(spark, tmpDir("graft-api-search-merge"))
    val base = 1700000000000000000L
    engine.ingestLines(Seq(
      s"""sa doc="alpha beta" $base""",
      s"""sb doc="alpha alpha" ${base + 1000000000L}""",
      s"""sc doc="beta gamma" ${base + 2000000000L}"""))
    val api = new ApiServer(engine).start()
    val url = s"http://127.0.0.1:${api.boundPort}"
    def storeOnly(): Boolean = {
      val q = engine.searchFrame(Seq("alpha"), 5)
      q.queryExecution.sparkPlan.collect { case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
      }.flatten.forall(_.contains("search_index"))
    }
    try {
      assert(call(s"$url/search/rebuild", "POST", "")._1 == 200)
      assert(call(s"$url/search?q=alpha")._2.contains("\"series\":\"sb\""))
      // corrections over the wire: sb re-texts, sc dies
      val (mc, mb) = call(s"$url/merge", "POST",
        s"""U sb doc="gamma gamma" ${base + 1000000000L}""" + "\n" +
          s"""D sc doc="x" ${base + 2000000000L}""")
      assert(mc == 200 && mb.contains("\"updated\":1") &&
        mb.contains("\"deleted\":1"), s"$mc $mb")
      // the merge reconcile refreshed the store: store-only plan AND
      // the corrected ranking — no rebuild call in between
      assert(storeOnly(), "post-merge /search left the store stale")
      val (c1, b1) = call(s"$url/search?q=alpha")
      assert(c1 == 200 && !b1.contains("\"series\":\"sb\"") &&
        b1.contains("\"series\":\"sa\""), s"stale alpha ranking: $b1")
      val (c2, b2) = call(s"$url/search?q=gamma")
      assert(c2 == 200 && b2.contains("\"series\":\"sb\"") &&
        !b2.contains("\"series\":\"sc\""),
        s"updated/deleted docs misranked: $b2")
      // plain /write makes the store stale — the guard routes to the
      // fact-table fallback, which SEES the new doc (correct, slower)
      assert(call(s"$url/write", "POST",
        s"""sd doc="omega omega" ${base + 3000000000L}""")._1 == 200)
      assert(!storeOnly(), "a stale store must route to the fallback")
      val (c3, b3) = call(s"$url/search?q=omega")
      assert(c3 == 200 && b3.contains("\"series\":\"sd\""),
        s"fallback hid the newly-written doc: $b3")
      // incremental refresh over the wire: store-only again, same hits
      assert(call(s"$url/search/refresh", "POST", "")._1 == 200)
      assert(storeOnly(), "refresh did not restore the store-only plan")
      val (c4, b4) = call(s"$url/search?q=omega")
      assert(c4 == 200 && b4.contains("\"series\":\"sd\""), b4)
    } finally api.stop()
  }

  test("GET /similar serves the PERSISTED item-item neighbor rollup with " +
      "hand-derived cosines, no fact scan at request time, and " +
      "fail-closed validation") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val engine = new Engine(spark, tmpDir("graft-api-similar"))
    val h = 3600000000000L // one hour in ns
    val base = 1700000000000000000L
    // hourly cents vectors of field v: ma=(300,400), mb=(300,400),
    // mc=(400,·). Norms 500/500/400; dots ma·mb=250000, ma·mc=120000,
    // mb·mc=120000 → cos(ma,mb)=1.0, cos(ma,mc)=cos(mb,mc)=0.6
    engine.ingestLines(Seq(
      s"ma,host=x v=3.0 $base",
      s"ma,host=x v=4.0 ${base + h}",
      s"mb,host=x v=3.0 $base",
      s"mb,host=x v=4.0 ${base + h}",
      s"mc,host=x v=4.0 $base"))
    val api = new ApiServer(engine).start()
    val url = s"http://127.0.0.1:${api.boundPort}"
    try {
      // before any build: 409 with the rebuild hint, not an empty list
      val (c0, b0) = call(s"$url/similar/ma?name=v")
      assert(c0 == 409 && b0.contains("rebuild"), s"$c0 $b0")
      assert(call(s"$url/similar/rebuild", "POST", "")._1 == 200)
      val (c1, b1) = call(s"$url/similar/ma?name=v")
      assert(c1 == 200, b1)
      assert(b1.contains(
        """{"rank":1,"series":"mb","cos_micro":1000000}""") &&
        b1.contains("""{"rank":2,"series":"mc","cos_micro":600000}"""), b1)
      // equal cosines tie-break by neighbor name (mc: ma and mb at 0.6)
      val (c2, b2) = call(s"$url/similar/mc?name=v")
      assert(c2 == 200 &&
        b2.contains("""{"rank":1,"series":"ma","cos_micro":600000}""") &&
        b2.contains("""{"rank":2,"series":"mb","cos_micro":600000}"""), b2)
      // k caps the stored list
      val (c3, b3) = call(s"$url/similar/ma?name=v&k=1")
      assert(c3 == 200 && b3.contains("mb") && !b3.contains("mc"), b3)
      // an unknown FIELD has no neighbors — empty list, not an error
      val (c4, b4) = call(s"$url/similar/ma?name=ghost")
      assert(c4 == 200 && b4.contains(""""neighbors":[]"""), s"$c4 $b4")
      // validation fails closed
      assert(call(s"$url/similar/ma?name=v&k=0")._1 == 400)
      assert(call(s"$url/similar/ma?name=v&k=21")._1 == 400)
      assert(call(s"$url/similar/ma")._1 == 400)
      assert(call(s"$url/similar/nope?name=v")._1 == 404)
      assert(call(s"$url/similar/ma?name=v", "POST", "")._1 == 405)
      // THE POINT of persisting the rollup: the serving plan reads ONLY
      // the stored neighbor table (partition-pruned to the field) — the
      // measurements fact table is never scanned at request time
      val q = engine.similarFrame("ma", "v", 5)
      val scans = q.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "no file scan in the serving plan")
      assert(scans.forall(_.relation.location.rootPaths.forall(
        _.toString.contains("similar_index"))),
        s"serving plan scans beyond the persisted index:\n$q")
      val idxScan = scans.head
      assert(idxScan.partitionFilters.nonEmpty,
        s"field lookup did not become a partition filter:\n$idxScan")
    } finally api.stop()
  }

  test("GET /stats serves the INCREMENTAL maintained stats store (no raw " +
      "scan at request time), POST /stats/refresh folds new batches") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val engine = new Engine(spark, tmpDir("graft-api-stats"))
    // 2023-11-14 (1700000000e9 ns): v = 1.5, 2.5
    engine.ingestLines(Seq(
      "cpu v=1.5 1700000000000000000",
      "cpu v=2.5 1700000000000000000"))
    val api = new ApiServer(engine).start()
    val url = s"http://127.0.0.1:${api.boundPort}"
    try {
      // before any refresh: 409 with the hint, not empty stats
      val (c0, b0) = call(s"$url/stats/cpu?name=v")
      assert(c0 == 409 && b0.contains("refresh"), s"$c0 $b0")
      assert(call(s"$url/stats/refresh", "POST", "")._1 == 200)
      val (c1, b1) = call(s"$url/stats/cpu?name=v")
      assert(c1 == 200 && b1.contains(
        """{"day":"2023-11-14","n":2,"sum":4.0,"avg":2.0,""" +
          """"min":1.5,"max":2.5}"""), s"$c1 $b1")
      // refresh folds ONLY the new batch; readout reflects the merge
      engine.ingestLines(Seq("cpu v=6.0 1700000000000000000"))
      assert(call(s"$url/stats/refresh", "POST", "")._1 == 200)
      val (c2, b2) = call(s"$url/stats/cpu?name=v")
      assert(c2 == 200 && b2.contains(
        """"n":3,"sum":10.0"""), s"$c2 $b2")
      // day-range filter + validation fail closed
      assert(call(s"$url/stats/cpu?name=v&from=2023-11-15")._2
        .contains(""""days":[]"""))
      assert(call(s"$url/stats/cpu")._1 == 400)
      assert(call(s"$url/stats/nope?name=v")._1 == 404)
      assert(call(s"$url/stats/cpu?name=v", "POST", "")._1 == 405)
      // serving plan reads ONLY the persisted store — never the fact table
      val q = engine.stats("cpu", "v")
      val scans = q.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "no file scan in the serving plan")
      assert(scans.forall(_.relation.location.rootPaths.forall(
        _.toString.contains("stats_daily"))),
        s"serving plan scans beyond the persisted store:\n$q")
    } finally api.stop()
  }

  test("GET /versions serves the committed manifest history with per-op " +
      "provenance (DESCRIBE HISTORY analog, round-16)") {
    val engine = new Engine(spark, tmpDir("graft-api-versions"))
    val api = new ApiServer(engine).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      // empty warehouse → empty history, not an error
      assert(call(s"$base/versions") == (200, """{"versions":[]}"""))
      engine.ingestLines(Seq("cpu v=1.0 1700000000000000000"))
      engine.ingestLines(Seq("cpu v=2.0 1700200000000000000"))
      val (c, b) = call(s"$base/versions")
      assert(c == 200 && b.contains(""""op":"bootstrap""""), b)
      assert(b.split(""""op":"write:""", -1).length == 3,
        s"expected two write publishes: $b")
      assert(call(s"$base/versions", "POST", "")._1 == 405)
    } finally api.stop()
  }
}
