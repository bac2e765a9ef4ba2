package graft.multimodal

import graft.SparkSpec
import graft.Tables

/** The multimodal plumbing: typed binary Datasets, batched decode/resize,
  * frame fan-out. Since round 2, image (ImageIO) and audio (javax.sound)
  * decode are REAL JDK-codec paths; the synthetic fake/... docs and video
  * keep the deterministic stub with the same contract.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.asMedia(Tables.load(spark, "/root/testdata/sf0.001", "documents"))

  test("feature extraction is deterministic and batch-shaped") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.forall(_.features.length == 4))
  }

  test("resize produces area-proportional payloads with updated metadata") {
    val r = Multimodal.resizeAll(media, 64, 32).collect()
    assert(r.forall(_.content.length == 64 * 32 / 64))
    assert(r.forall(_.format.endsWith(";resized=64x32")))
    assert(r.forall(m => m.n_bytes == m.content.length.toLong))
  }

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37 + y * 101) % 0xffffff))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(sampleRate: Float, seconds: Double): Array[Byte] = {
    import javax.sound.sampled._
    val n = (sampleRate * seconds).toInt
    val pcm = new Array[Byte](n * 2) // 16-bit mono
    var i = 0
    while (i < n) {
      val v = (math.sin(i * 0.05) * 8000).toInt
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("REAL image decode + resize via JDK ImageIO (PNG end-to-end)") {
    import spark.implicits._
    val bytes = pngBytes(20, 10)
    val items = Seq(MediaItem(1L, bytes, "image/png", bytes.length.toLong)).toDS()
    val f = Multimodal.extractFeatures(items).collect().head
    assert(f.width == 20 && f.height == 10) // true header dims, not the stub
    assert(f.features(2) == 200.0) // w*h
    assert(f.features(3) > 0.0 && f.features(3) < 255.0) // mean luminance

    val resized = Multimodal.resizeAll(items, 8, 6).collect().head
    assert(resized.format == "image/png;resized=8x6")
    val back = Multimodal.decodeImage(resized.content).get
    assert(back.getWidth == 8 && back.getHeight == 6) // re-decodable PNG
  }

  test("REAL WAV decode via javax.sound (rate/channels/duration)") {
    import spark.implicits._
    val bytes = wavBytes(8000f, 0.5)
    val items = Seq(MediaItem(2L, bytes, "audio/wav", bytes.length.toLong)).toDS()
    val f = Multimodal.extractFeatures(items).collect().head
    assert(f.width == 8000 && f.height == 1) // sample rate, channels
    assert(f.features(2) == 4000.0) // frames
    assert(math.abs(f.features(3) - 0.5) < 1e-6) // seconds
  }

  test("undecodable payload under an image/* format falls back to the stub") {
    import spark.implicits._
    val junk = Array.tabulate[Byte](64)(_.toByte)
    val items = Seq(MediaItem(3L, junk, "image/png", 64L)).toDS()
    val f = Multimodal.extractFeatures(items).collect().head
    val (w, h) = Multimodal.decodeStub(junk)
    assert(f.width == w && f.height == h) // graceful, deterministic
  }

  test("frame sampling fans out n rows per item with ordered offsets") {
    val frames = Multimodal.sampleFrames(media, 4).collect()
    assert(frames.length == media.count() * 4)
    val byDoc = frames.groupBy(_._1)
    byDoc.values.foreach { fs =>
      val offsets = fs.sortBy(_._2).map(_._3)
      assert(offsets.length == 4)
      assert(offsets.sorted.sameElements(offsets)) // evenly increasing
    }
  }

  // --- REAL video: build an MJPEG-AVI in-memory (RIFF writer below), then
  // sample + decode actual JPEG frames through the production path

  private def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = data.length & 1
    val bb = java.nio.ByteBuffer.allocate(8 + data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
    if (pad == 1) bb.put(0.toByte)
    bb.array
  }

  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val movi = riffChunk("LIST",
      "movi".getBytes("US-ASCII") ++
        frames.toArray.flatMap(f => riffChunk("00dc", f)))
    riffChunk("RIFF", "AVI ".getBytes("US-ASCII") ++ movi)
  }

  test("REAL MJPEG-AVI frame sampling: container parse + per-frame JPEG " +
      "decode through the production sampleFrames path") {
    import spark.implicits._
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000)
    val avi = mjpegAvi(colors.map(c => jpegFrame(32, 24, c)))
    val items = Seq(MediaItem(42L, avi, "video/avi", avi.length.toLong)).toDS()

    val sampled = Multimodal.sampleFrames(items, 3).collect().sortBy(_._2)
    assert(sampled.length == 3)
    // every emitted payload is a complete JPEG the JDK decodes at the
    // source dimensions — proof these are real container frames, not
    // byte windows
    sampled.foreach { case (doc, _, off, payload) =>
      assert(doc == 42L && off > 0)
      assert((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8) // JPEG SOI
      val img = Multimodal.decodeImage(payload).get
      assert(img.getWidth == 32 && img.getHeight == 24)
    }
    // evenly-spaced selection over 5 frames for n=3 → indices 0, 1, 3
    val chunks = Multimodal.aviFrameChunks(avi)
    assert(chunks.length == 5)
    assert(sampled.map(_._3).toSeq ==
      Seq(chunks(0)._1, chunks(1)._1, chunks(3)._1))

    // feature extraction takes the real video branch: first-frame dims +
    // container frame count
    val f = Multimodal.extractFeatures(items).collect().head
    assert(f.width == 32 && f.height == 24)
    assert(f.features(0) == 5.0)
  }

  test("AVI parser never throws on corrupt containers (fuzz)") {
    val valid = mjpegAvi(Seq(jpegFrame(8, 8, 0x123456)))
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val mutated = valid.clone()
      (1 to 5).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt().toByte
      }
      val truncated = mutated.take(rnd.nextInt(mutated.length + 1))
      // must return cleanly (frames or empty), never throw — a poisoned
      // payload in a 100 TB corpus must not kill the task
      Multimodal.aviFrameChunks(mutated)
      Multimodal.aviFrameChunks(truncated)
      Multimodal.sampleFramesAvi(truncated, 3)
    }
  }

  /** PNG of a gray pattern drawn per pixel by `g(x, y)` ∈ [0, 255]. */
  private def patternPng(w: Int, h: Int)(g: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = g(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("perceptual dHash: deterministic, edit-tolerant, and the banded " +
      "Hamming join finds exactly the near-dup pair") {
    import spark.implicits._
    def vstripes(x: Int, y: Int) = if ((x / 4) % 2 == 0) 230 else 20
    def hstripes(x: Int, y: Int) = if ((y / 4) % 2 == 0) 230 else 20
    val a = patternPng(64, 32)(vstripes)
    // one edited pixel — a re-save/touch-up, perceptually the same image
    val a1 = patternPng(64, 32)((x, y) =>
      if (x == 10 && y == 10) 255 - vstripes(x, y) else vstripes(x, y))
    val b = patternPng(64, 32)(hstripes)
    def hash(bytes: Array[Byte]): Long =
      Multimodal.dHash(Multimodal.decodeImage(bytes).get)
    // deterministic
    assert(hash(a) == hash(a))
    // the single-pixel edit moves at most a couple of downsampled cells
    assert(java.lang.Long.bitCount(hash(a) ^ hash(a1)) <= 3)
    // vertical vs horizontal stripes: structurally different images
    assert(java.lang.Long.bitCount(hash(a) ^ hash(b)) > 3)
    // RESIZE robustness — the property byte-level hashes cannot have:
    // the same pattern at half resolution hashes within the near-dup band
    val aSmall = patternPng(32, 16)((x, y) => vstripes(x * 2, y * 2))
    assert(java.lang.Long.bitCount(hash(a) ^ hash(aSmall)) <= 3)

    val items = Seq(
      MediaItem(1L, a, "image/png", a.length.toLong),
      MediaItem(2L, a1, "image/png", a1.length.toLong),
      MediaItem(3L, b, "image/png", b.length.toLong),
      // undecodable payload must be dropped, not crash the hash pass
      MediaItem(4L, Array.fill[Byte](32)(7), "image/png", 32L)).toDS()
    val hashes = Multimodal.imageHashes(items)
    assert(hashes.count() == 3) // doc 4 dropped
    val pairs = Multimodal.imageNearDups(hashes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
      pairs.mkString(", "))
    assert(pairs.head._3 <= 3)
  }

  /** WAV with a 64-window amplitude ENVELOPE: window w plays a sine at
    * amplitude 12000 where env(w) is true, 3000 otherwise — 16× energy
    * steps, far above 16-bit quantization noise. */
  private def envelopeWav(sampleRate: Float, env: Int => Boolean,
      gain: Double = 1.0): Array[Byte] = {
    import javax.sound.sampled._
    val n = (sampleRate * 1.3).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val w = (i.toLong * 64 / n).toInt
      val amp = (if (env(w)) 12000.0 else 3000.0) * gain
      val v = (math.sin(i * 0.35) * amp).toInt
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("perceptual audio fingerprint: deterministic, gain- and " +
      "resample-invariant, and the banded Hamming join finds the " +
      "near-dup pair") {
    import spark.implicits._
    def altEnv(w: Int): Boolean = (w / 2) % 2 == 0 // slow loud/quiet
    def runEnv(w: Int): Boolean = (w / 8) % 2 == 0 // different structure
    val a = envelopeWav(8000f, altEnv)
    // one replaced window — a splice edit, perceptually the same clip
    val a1 = envelopeWav(8000f, w => if (w == 30) !altEnv(w) else altEnv(w))
    val b = envelopeWav(8000f, runEnv)
    def hash(bytes: Array[Byte]): Long =
      Multimodal.aHash(Multimodal.decodePcm(bytes).get._2)
    // deterministic
    assert(hash(a) == hash(a))
    // GAIN invariance — the property byte hashes cannot have: a -6 dB
    // master of the same clip fingerprints identically (all window
    // energies scale together; every comparison is relative)
    assert(hash(envelopeWav(8000f, altEnv, gain = 0.5)) == hash(a))
    // RESAMPLE robustness: half-rate encode of the same envelope stays
    // within the near-dup band (windows are fractions of the clip)
    assert(java.lang.Long.bitCount(
      hash(envelopeWav(4000f, altEnv)) ^ hash(a)) <= 3)
    // the one-window splice flips only the adjacent comparisons
    assert(java.lang.Long.bitCount(hash(a) ^ hash(a1)) <= 3)
    // structurally different envelopes separate
    assert(java.lang.Long.bitCount(hash(a) ^ hash(b)) > 3)

    val items = Seq(
      MediaItem(1L, a, "audio/wav", a.length.toLong),
      MediaItem(2L, a1, "audio/wav", a1.length.toLong),
      MediaItem(3L, b, "audio/wav", b.length.toLong),
      // undecodable payload must be dropped, not crash the hash pass
      MediaItem(4L, Array.fill[Byte](32)(7), "audio/wav", 32L)).toDS()
    val hashes = Multimodal.audioHashes(items)
    assert(hashes.count() == 3) // doc 4 dropped
    val pairs = Multimodal.audioNearDups(hashes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
      pairs.mkString(", "))
    assert(pairs.head._3 <= 3)
  }

  test("video near-dup: frame-level perceptual matching finds the " +
      "one-frame-edited copy, separates different footage") {
    import spark.implicits._
    def vstripes(x: Int, y: Int) = if ((x / 4) % 2 == 0) 230 else 20
    def hstripes(x: Int, y: Int) = if ((y / 4) % 2 == 0) 230 else 20
    // patterned JPEG frames (flat-color frames would all dHash to 0)
    def frame(g: (Int, Int) => Int, tweak: Boolean = false): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 64) {
        val v = if (tweak && x == 10 && y == 10) 255 - g(x, y) else g(x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // video A: 5 frames alternating stripe phase; A': same but the middle
    // frame carries a one-pixel edit (a re-encode/watermark); B: the
    // transposed footage
    def reel(g: (Int, Int) => Int, tweakMid: Boolean): Seq[Array[Byte]] =
      (0 until 5).map(i => frame(g, tweak = tweakMid && i == 2))
    val aviA = mjpegAvi(reel(vstripes, tweakMid = false))
    val aviA1 = mjpegAvi(reel(vstripes, tweakMid = true))
    val aviB = mjpegAvi(reel(hstripes, tweakMid = false))
    val items = Seq(
      MediaItem(1L, aviA, "video/avi", aviA.length.toLong),
      MediaItem(2L, aviA1, "video/avi", aviA1.length.toLong),
      MediaItem(3L, aviB, "video/avi", aviB.length.toLong),
      // non-AVI payload under video/*: stub byte windows decode to no
      // frames — dropped, not crashed
      MediaItem(4L, Array.fill[Byte](64)(9), "video/mp4", 64L)).toDS()
    val fh = Multimodal.videoFrameHashes(items, n = 3)
    assert(fh.count() == 9) // 3 videos × 3 frames; doc 4 dropped
    val pairs = Multimodal.videoNearDups(fh)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
      pairs.mkString(", "))
    assert(pairs.head._3 == 3L) // all three sampled positions match
  }
}
