package graft.ingest

import java.net.{DatagramPacket, DatagramSocket, HttpURLConnection, InetAddress, URI}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.engine.Engine

/** End-to-end: UDP datagram + HTTP POST → spool files → Structured
  * Streaming file source → canonical table (reference E3 path).
  */
class GatewaySpec extends SparkSpec {

  test("UDP + HTTP ingest land in the engine table") {
    val spool = tmpDir("graft-spool")
    val gw = new Gateway(spool).start()
    try {
      // HTTP /write (R4)
      val con = URI.create(s"http://127.0.0.1:${gw.boundHttpPort}/write")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      con.setRequestMethod("POST")
      con.setDoOutput(true)
      con.getOutputStream.write(
        "http_series,src=http v=1.0 1700000000000000000\n".getBytes(UTF_8))
      assert(con.getResponseCode == 200)

      // UDP datagram (R3)
      val sock = new DatagramSocket()
      val payload = "udp_series,src=udp v=2.0,w=3.0 1700000001000000000"
        .getBytes(UTF_8)
      sock.send(new DatagramPacket(payload, payload.length,
        InetAddress.getByName("127.0.0.1"), gw.boundUdpPort))
      sock.close()

      // wait for the UDP thread to spool (HTTP is synchronous)
      val deadline = System.currentTimeMillis() + 5000
      while (new java.io.File(spool).listFiles().count(_.getName.endsWith(".txt")) < 2
        && System.currentTimeMillis() < deadline) Thread.sleep(50)

      // file source → engine (st-path)
      val engine = new Engine(spark, tmpDir("graft-gw-wh"))
      val lines = spark.readStream.text(spool)
      val q = engine.ingestStream(lines, tmpDir("graft-gw-ckpt"))
      q.processAllAvailable()
      q.stop()

      assert(engine.listSeries() == Seq("http_series", "udp_series"))
      // multi-field UDP line fans out to 2 rows
      assert(engine.table().filter(col("series") === "udp_series").count() == 2)

      // the DSv2 lineprotocol source tails the SAME spool natively —
      // already-parsed rows, no text+parse step, same fan-out
      val q2 = spark.readStream.format("lineprotocol").load(spool)
        .filter(col("parse_error").isNull)
        .writeStream.option("checkpointLocation", tmpDir("graft-gw-ckpt2"))
        .outputMode("append").format("memory").queryName("gw_dsv2").start()
      q2.processAllAvailable()
      q2.stop()
      val rows = spark.table("gw_dsv2").collect()
      assert(rows.length == 3) // 1 http + 2-field udp fan-out
      assert(rows.map(_.getAs[String]("series")).distinct.sorted.toSeq ==
        Seq("http_series", "udp_series"))
    } finally gw.stop()
  }
}
