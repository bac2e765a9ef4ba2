package graft.engine

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors,
  TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Round-8 VERDICT #5: the API pool, streaming ingest and the
  * foreachBatch maintenance slot (compaction + tag index) exercised
  * SIMULTANEOUSLY. The contract under concurrency:
  *
  *  - no deadlock (the 8ddd636 lock-order class) — everything completes
  *    inside the latch timeout;
  *  - every response is classifiable: a COMPLETE well-formed JSON array,
  *    a DETECTABLY truncated chunked body (a streamed read that raced the
  *    compaction dir swap — D8 semantics: broken JSON, never silently
  *    wrong), or a clean 4xx/5xx. Nothing unclassifiable.
  *  - plan-side caps hold exactly under load (max_rows responses);
  *  - the final state is exact: seeded + streamed rows all present,
  *    maintenance artifacts (compacted dirs, tag index) in place.
  */
class ConcurrentLoadSpec extends SparkSpec {

  private def post(url: String, bodyStr: String): (Int, String) = {
    val con = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    con.setRequestMethod("POST")
    con.setDoOutput(true)
    con.getOutputStream.write(bodyStr.getBytes(UTF_8))
    val code = con.getResponseCode
    val is = if (code < 400) con.getInputStream else con.getErrorStream
    val out = try new String(is.readAllBytes(), UTF_8)
      catch { case _: java.io.IOException => "<<stream-aborted>>" }
    (code, out)
  }

  test("parallel streamed queries + live ingest + compaction/tag-index " +
      "maintenance: no deadlock, no silent corruption, exact final state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val engine = new Engine(spark, tmpDir("graft-conc"))
    val seeded = 3000
    engine.ingestLines((1 to seeded).map(i =>
      s"cpu,host=h${i % 7} v=$i.5 ${1700000000000000000L + i * 1000000000L}"))
    val api = new ApiServer(engine, poolSize = 6).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    val in = MemoryStream[String]
    val stream = engine.ingestStream(in.toDF().toDF("value"),
      tmpDir("graft-conc-ckpt"),
      compactEveryBatches = 2, tagIndexEveryBatches = 2)

    val clients = 8
    val rounds = 4
    val pool = Executors.newFixedThreadPool(clients)
    val problems = new ConcurrentLinkedQueue[String]()
    val complete = new AtomicInteger()
    val truncated = new AtomicInteger()
    val errored = new AtomicInteger()
    val timedOut = new AtomicInteger()
    val done = new CountDownLatch(clients)
    try {
      for (t <- 1 to clients) pool.submit(new Runnable {
        override def run(): Unit = {
          try {
            for (r <- 1 to rounds) (t + r) % 4 match {
              case 0 => // full streamed result: complete or DETECTABLY cut
                val (c, b) = post(s"$base/query",
                  "q=SELECT%20name%2C%20value%20FROM%20cpu")
                if (c >= 400) errored.incrementAndGet()
                else if (b.startsWith("[") && b.endsWith("]") &&
                    (b == "[]" || (b.startsWith("[{") && b.endsWith("}]"))))
                  complete.incrementAndGet()
                else truncated.incrementAndGet() // broken JSON = detectable
              case 1 => // plan-side cap must hold EXACTLY under load
                val (c, b) = post(s"$base/query?max_rows=50",
                  "q=SELECT%20name%2C%20value%20FROM%20cpu")
                if (c >= 400) errored.incrementAndGet()
                else if (b.startsWith("[{") && b.endsWith("}]")) {
                  if (b.split("\\},\\{").length == 50)
                    complete.incrementAndGet()
                  else problems.add(s"max_rows=50 returned wrong count")
                } else truncated.incrementAndGet()
              case 2 => // the reference's own range path, same contract
                val (c, b) = post(
                  s"$base/query?max_rows=25",
                  "q=SELECT%20id%2C%20name%2C%20value%20FROM%20cpu")
                if (c >= 400) errored.incrementAndGet()
                else if (b.startsWith("[{") && b.endsWith("}]"))
                  complete.incrementAndGet()
                else truncated.incrementAndGet()
              case 3 => // an intentionally-unmeetable bound UNDER load:
                // must resolve promptly (latch) as a clean 408 or, if
                // the first partition won the race, a normal/truncated
                // stream — and must never take down a neighbor (their
                // groups are independent)
                val (c, b) = post(s"$base/query?timeout_ms=1",
                  "q=SELECT%20name%2C%20value%20FROM%20cpu")
                if (c == 408) timedOut.incrementAndGet()
                else if (c >= 400) errored.incrementAndGet()
                else if (b.startsWith("[") && b.endsWith("]"))
                  complete.incrementAndGet()
                else truncated.incrementAndGet()
            }
          } catch {
            case e: Exception => problems.add(s"client $t: $e")
          } finally done.countDown()
        }
      })

      // drive 7 micro-batches while the clients hammer the query surface.
      // The every-2 maintenance slot (id > 0 && id % 2 == 0) fires at
      // batches 2, 4 and 6 — 3 compactions + 3 tag-index rebuilds, and
      // the LAST rebuild runs after batch 6's own write, so the index is
      // fresh (tagIndexBuiltAt == writeVersion) and the tag query below
      // must take the pruned path, not the staleness-fallback full scan
      val streamed = 700
      for (b <- 0 until 7) {
        in.addData((1 to 100).map(i =>
          s"cpu,host=s$b v=${b * 100 + i}.25 " +
            s"${1710000000000000000L + (b * 100 + i) * 1000000000L}"): _*)
        stream.processAllAvailable()
      }

      // the latch is the deadlock detector: lock-order regressions hang
      // a client on a query the maintenance slot will never release
      assert(done.await(300, TimeUnit.SECONDS),
        "concurrent load did not finish: deadlock or stuck stream")
      assert(problems.isEmpty, s"contract violations: $problems")
      val total = complete.get() + truncated.get() + errored.get() +
        timedOut.get()
      assert(total == clients * rounds, s"lost responses: $total")
      // the surface must actually WORK under load, not fail gracefully
      // every time: most NON-timeout responses complete (truncation is
      // only legitimate for reads racing a compaction swap; the
      // timeout_ms=1 class is EXPECTED to 408)
      assert(complete.get() >= (clients * rounds * 3 / 4) / 2,
        s"complete=$complete truncated=$truncated errored=$errored " +
          s"timedOut=$timedOut")

      // exact final state: every seeded + streamed row present
      assert(engine.table().count() == seeded + streamed)
      // maintenance really ran in the slot: the tag index is fresh enough
      // to serve the PRUNED path (the pruned plan re-enters the table
      // with literal IN predicates on the partition columns; the
      // staleness fallback is a plain tags[k] filter with no IN), and
      // the table survived its compactions
      val viaTagDf = engine.queryByTag("host", "s5")
      assert(viaTagDf.queryExecution.analyzed.toString.contains(" IN "),
        "queryByTag took the staleness-fallback scan, not the index-pruned path")
      val viaTag = viaTagDf.count()
      assert(viaTag == 100, s"tag-index path returned $viaTag")
      info(s"complete=$complete truncated=$truncated errored=$errored " +
        s"timedOut=$timedOut")
    } finally {
      stream.stop(); api.stop(); pool.shutdownNow()
    }
  }
}
