package graft.ingest

import java.io.ByteArrayOutputStream
import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Network ingest gateway (reference R3/R4: UDP loop at refluxdb
  * src/udpserver.rs:16-106, `POST /write` at src/handlers.rs:100-145),
  * JDK-only — no Spark dependency.
  *
  * Spark has no UDP source, so the gateway spools raw lines to files
  * (write-temp-then-atomic-rename, so the Structured Streaming file source
  * never sees partial files); `spark.readStream.text(spoolDir)` +
  * `Engine.ingestStream` complete the pipeline (SURVEY §7.6-1). The spool is
  * replayable — a crashed stream resumes from the checkpoint, unlike the
  * reference's fire-and-forget datagram handling.
  *
  * Reference quirks deliberately not replicated (SURVEY Q-H/D5): no
  * 1024-byte truncation (64 KiB datagram buffer), no last-byte stripping
  * (we split on newlines).
  */
class Gateway(spoolDir: String, httpPort: Int = 0, udpPort: Int = 0) {

  private val seq = new AtomicLong(0)
  @volatile private var running = false
  private var http: HttpServer = _
  private var udp: DatagramSocket = _
  private var udpThread: Thread = _

  Files.createDirectories(Paths.get(spoolDir))

  /** Spool a batch of lines as one atomically-visible file. */
  def appendLines(lines: Seq[String]): Unit = if (lines.nonEmpty) {
    val n = seq.incrementAndGet()
    val name = s"batch-${System.currentTimeMillis()}-$n.txt"
    val tmp = Paths.get(spoolDir, s".$name.tmp")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(UTF_8))
    Files.move(tmp, Paths.get(spoolDir, name),
      StandardCopyOption.ATOMIC_MOVE)
  }

  def boundHttpPort: Int = http.getAddress.getPort
  def boundUdpPort: Int = udp.getLocalPort

  def start(): this.type = {
    running = true
    http = HttpServer.create(new InetSocketAddress("127.0.0.1", httpPort), 0)
    http.createContext("/write", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = {
          val buf = new ByteArrayOutputStream()
          ex.getRequestBody.transferTo(buf)
          buf.toString(UTF_8)
        }
        if (ex.getRequestMethod == "POST") {
          appendLines(body.split("\r?\n").toSeq.filter(_.nonEmpty))
          val resp = "{\"status\":\"ok\"}".getBytes(UTF_8)
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp)
        } else ex.sendResponseHeaders(405, -1)
        ex.close()
      }
    })
    http.start()

    udp = new DatagramSocket(new InetSocketAddress("127.0.0.1", udpPort))
    udpThread = new Thread(() => {
      val buf = new Array[Byte](65536)
      while (running) {
        try {
          val pkt = new DatagramPacket(buf, buf.length)
          udp.receive(pkt)
          val text = new String(pkt.getData, pkt.getOffset, pkt.getLength, UTF_8)
          appendLines(text.split("\r?\n").toSeq.filter(_.nonEmpty))
        } catch {
          case _: java.net.SocketException if !running => // closed
          case _: Exception if running => // keep serving
        }
      }
    }, "graft-udp-gateway")
    udpThread.setDaemon(true)
    udpThread.start()
    this
  }

  def stop(): Unit = {
    running = false
    if (http != null) http.stop(0)
    if (udp != null) udp.close()
  }
}
