package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque binary payload + typed metadata.
  *
  * This is the 100 TB-scale shape for image/audio/video columns: content is
  * an opaque BINARY column (parquet keeps it contiguous and compressed),
  * metadata is typed columns so filters/pruning never touch the bytes.
  */
case class MediaItem(
    doc_id: Long,
    content: Array[Byte],
    format: String,
    n_bytes: Long)

/** Extracted features for one media item. */
case class MediaFeatures(
    doc_id: Long,
    width: Int,
    height: Int,
    checksum: Long,
    features: Array[Double])

/** Multimodal column processing (SURVEY.md §2.4 i / builder contract).
  *
  * Decode is REAL for the formats the JDK can handle without dependencies:
  * images via `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF — [[decodeImage]],
  * [[resizeImage]]), audio via `javax.sound.sampled` (WAV/PCM —
  * [[decodeWav]]), and video for MJPEG-in-AVI (round 3 — [[aviFrameChunks]]
  * walks the RIFF chunk tree, each movi `##dc` chunk is a complete JPEG
  * ImageIO decodes). Dispatch is on the `format` metadata column; payloads
  * with no JVM-parseable codec/container (other video codecs; the
  * synthetic `fake/...` docs used by the oracle) fall back to the
  * clearly-marked deterministic stubs, which keep the same output
  * contract. The Spark shape is identical either way: opaque BINARY
  * column, typed metadata, batched mapPartitions with once-per-partition
  * codec init.
  */
object Multimodal {

  // ------------------------------------------------------------ real codecs

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF readers are
    * built in — no external dependency). None when no installed reader
    * claims the payload. */
  def decodeImage(bytes: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** REAL image resize: decode, scale through Graphics2D, re-encode PNG. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decodeImage(bytes).map { img =>
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

  /** REAL WAV/PCM decode via javax.sound: (sampleRate, channels, frames). */
  def decodeWav(bytes: Array[Byte]): Option[(Float, Int, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val r = (fmt.getSampleRate, fmt.getChannels, ais.getFrameLength)
      ais.close()
      Some(r)
    } catch { case _: Exception => None }

  /** Image features: dims + mean luminance over a bounded pixel sample
    * (cap the per-image work so one 100-MP outlier cannot stall a task). */
  private def imageFeatures(img: java.awt.image.BufferedImage): Array[Double] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val stepX = math.max(w / 64, 1)
    val stepY = math.max(h / 64, 1)
    var sum = 0.0
    var n = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
        n += 1
        x += stepX
      }
      y += stepY
    }
    Array(w.toDouble, h.toDouble, w.toDouble * h, if (n == 0) 0.0 else sum / n)
  }

  /** Documents → media items (text bytes stand in for image payloads). */
  def asMedia(documents: DataFrame): Dataset[MediaItem] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"),
        col("text").cast("binary").as("content"),
        concat(lit("fake/"), col("source")).as("format"),
        length(col("text")).cast("long").as("n_bytes"))
      .as[MediaItem]
  }

  /** STUB decode for payloads without a JVM codec (video; the synthetic
    * `fake/...` documents the oracle checks): deterministic fake dimensions
    * derived from the bytes. Image/audio take the REAL paths above. */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val w = 16 + (bytes.length % 64)
    val h = 16 + (if (bytes.isEmpty) 0 else (bytes(0) & 0xff) % 64)
    (w, h)
  }

  /** STUB feature extraction over one decoded payload: byte-level statistics
    * in place of a model forward pass. Deterministic. */
  def featuresStub(bytes: Array[Byte]): Array[Double] = {
    val n = math.max(bytes.length, 1).toDouble
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    val distinct = bytes.distinct.length.toDouble
    Array(bytes.length.toDouble, sum / n, distinct, (sum % 997).toDouble)
  }

  /** Batched per-partition feature extraction — the mapPartitions shape
    * matters: codec init (ImageIO disk-cache off) happens once per
    * partition, not per row (the same reason Python pipelines use
    * mapInPandas batches). Dispatch on `format`: image/... and audio/... run
    * the REAL JDK codecs; anything else (video, synthetic fake/...) takes
    * the deterministic stub with the same output contract. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      // per-partition init happens HERE once
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in tasks
      it.map { m =>
        val sum = m.content.foldLeft(0L)((a, b) => a + (b & 0xff))
        val checksum = sum % 997
        val decoded: Option[MediaFeatures] =
          if (m.format.startsWith("image/"))
            decodeImage(m.content).map { img =>
              MediaFeatures(m.doc_id, img.getWidth, img.getHeight, checksum,
                imageFeatures(img))
            }
          else if (m.format.startsWith("audio/"))
            decodeWav(m.content).map { case (rate, channels, frames) =>
              MediaFeatures(m.doc_id, rate.toInt, channels, checksum,
                Array(rate.toDouble, channels.toDouble, frames.toDouble,
                  frames / math.max(rate.toDouble, 1.0)))
            }
          else if (m.format.startsWith("video/")) {
            // REAL for MJPEG-AVI: dims from the first decoded frame,
            // frame count from the container walk
            val frames = aviFrameChunks(m.content)
            frames.headOption.flatMap(f => decodeImage(f._2)).map { img =>
              MediaFeatures(m.doc_id, img.getWidth, img.getHeight, checksum,
                Array(frames.length.toDouble, img.getWidth.toDouble,
                  img.getHeight.toDouble, m.n_bytes.toDouble))
            }
          } else None
        decoded.getOrElse {
          val (w, h) = decodeStub(m.content)
          MediaFeatures(m.doc_id, w, h, checksum, featuresStub(m.content))
        }
      }
    }
  }

  // ------------------------------------------------- perceptual image hash

  /** REAL perceptual hash (dHash, 64 bits): scale to 9×8 grayscale and set
    * bit (y·8+x) when luminance(x,y) > luminance(x+1,y). Robust to
    * re-encoding, resizing and small edits (the gradient STRUCTURE
    * survives them), unlike the byte-level sha/simhash family, which a
    * single re-encode scrambles completely — this is the image analog of
    * the text near-dup hashes. Deterministic: fixed-size nearest-neighbor
    * scale, integer luminance. */
  def dHash(img: java.awt.image.BufferedImage): Long = {
    val s = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = s.createGraphics()
    g.drawImage(img, 0, 0, 9, 8, null)
    g.dispose()
    def lum(x: Int, y: Int): Int = {
      val rgb = s.getRGB(x, y)
      ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
    }
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(x, y) > lum(x + 1, y)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** (doc_id, phash) per decodable image — mapPartitions like
    * [[extractFeatures]] (codec init once per partition); rows whose
    * payload no reader claims are dropped (they have no perceptual
    * content to hash). */
  def imageHashes(items: Dataset[MediaItem]): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { m =>
        if (m.format.startsWith("image/"))
          decodeImage(m.content).map(img => (m.doc_id, dHash(img)))
        else None
      }
    }.toDF("doc_id", "phash")
  }

  /** Near-duplicate image pairs by banded Hamming join — the SimHash
    * prefix-block recipe applied to the perceptual hash: the 64-bit
    * dHash splits into 4 disjoint 16-bit bands, and any pair within
    * Hamming distance ≤ 3 differs in at most 3 bands, so BY PIGEONHOLE
    * at least one band matches exactly → candidates come from 4 band
    * equi-joins (one shuffle on (band, key), never all-pairs), then the
    * exact `bit_count(xor)` filter verifies. Scale shape: candidate
    * volume is bounded by band-bucket occupancy (2^16 buckets per band),
    * and the verify is a codegen'd integer op. */
  def imageNearDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(hashes, "phash", maxHamming)

  /** REAL PCM sample decode via javax.sound (the [[decodeWav]] sibling
    * that returns the SAMPLES): any format the JDK can convert to signed
    * 16-bit PCM comes back as mono doubles in [-1, 1] (channels
    * averaged) plus the sample rate. None for undecodable payloads. */
  def decodePcm(bytes: Array[Byte]): Option[(Float, Array[Double])] =
    try {
      import javax.sound.sampled._
      val in0 = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val base = in0.getFormat
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        base.getSampleRate, 16, base.getChannels,
        base.getChannels * 2, base.getSampleRate, false)
      val in = AudioSystem.getAudioInputStream(fmt, in0)
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
      in.close(); in0.close()
      val raw = bos.toByteArray
      val ch = fmt.getChannels
      val nFrames = raw.length / (2 * ch)
      if (nFrames == 0) None
      else {
        val mono = new Array[Double](nFrames)
        var i = 0
        while (i < nFrames) {
          var c = 0
          var acc = 0.0
          while (c < ch) {
            val o = (i * ch + c) * 2
            acc += (((raw(o + 1) << 8) | (raw(o) & 0xff)).toShort) / 32768.0
            c += 1
          }
          mono(i) = acc / ch
          i += 1
        }
        Some((fmt.getSampleRate, mono))
      }
    } catch { case _: Exception => None }

  /** 64-bit perceptual AUDIO fingerprint — the image world's AVERAGE
    * hash applied to the energy envelope: the clip splits into 64 equal
    * windows, each reduced to its mean energy, and bit i records whether
    * window i is louder than the CLIP-WIDE mean. The comparison-to-mean
    * form (not adjacent-window differences) matters: equal-loudness
    * adjacent windows are the COMMON case in audio, and a difference
    * bit between them is decided by quantization/phase noise that flips
    * under resampling — measured 17/64 noise bits on a synthetic
    * envelope before the switch. Against the mean, every bit is decided
    * by the envelope's structure. Survives exactly the edits that
    * scramble byte hashes: global gain (all energies AND the mean scale
    * by g² — every comparison preserved), resampling (windows are
    * FRACTIONS of the clip, so per-window energy is rate-independent),
    * container re-encode; a spliced window flips its own bit (plus any
    * window sitting at the mean — the same tie fragility image aHash
    * has on flat images). */
  def aHash(samples: Array[Double]): Long = {
    val W = 64
    val n = samples.length
    val e = new Array[Double](W)
    var w = 0
    while (w < W) {
      val st = (w.toLong * n / W).toInt
      val en = ((w + 1).toLong * n / W).toInt
      var s = 0.0
      var i = st
      while (i < en) { s += samples(i) * samples(i); i += 1 }
      e(w) = if (en > st) s / (en - st) else 0.0
      w += 1
    }
    var mean = 0.0
    var j = 0
    while (j < W) { mean += e(j); j += 1 }
    mean /= W
    var bits = 0L
    var i = 0
    while (i < W) {
      if (e(i) > mean) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** (doc_id, ahash) per decodable audio payload — the [[imageHashes]]
    * contract for the audio modality. */
  def audioHashes(items: Dataset[MediaItem]): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      it.flatMap { m =>
        if (m.format.startsWith("audio/"))
          decodePcm(m.content).map { case (_, mono) => (m.doc_id, aHash(mono)) }
        else None
      }
    }.toDF("doc_id", "ahash")
  }

  /** Near-duplicate audio pairs — the identical banded-Hamming recipe as
    * [[imageNearDups]] over the audio fingerprint (shared helper, same
    * pigeonhole guarantee to Hamming 3, same one-shuffle scale shape). */
  def audioNearDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(hashes, "ahash", maxHamming)

  /** The 4×16-bit banded Hamming self-join shared by the image and audio
    * perceptual hashes: band equi-joins (pigeonhole-complete to Hamming
    * 3) + codegen'd bit_count verify, never all-pairs. */
  private def bandedHammingPairs(hashes: DataFrame, hashCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming <= 3,
      s"4 bands guarantee recall only to Hamming 3; got $maxHamming")
    val banded = hashes.select(col("doc_id"), col(hashCol),
      explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("key", expr(s"($hashCol >> (band * 16)) & 65535"))
    val a = banded.select(col("doc_id").as("doc_a"),
      col(hashCol).as("ha"), col("band"), col("key"))
    val b = banded.select(col("doc_id").as("doc_b"),
      col(hashCol).as("hb"), col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(ha ^ hb)").cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** STUB resize: a real implementation re-encodes pixels; the stub keeps
    * the contract — output payload is a deterministic function of (input,
    * target dims) with byte length proportional to the target area. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(w * h / 64, 1))
    var i = 0
    while (i < out.length) {
      out(i) = if (bytes.isEmpty) 0 else bytes(i % bytes.length)
      i += 1
    }
    out
  }

  // ------------------------------------------------------- real video (AVI)

  /** REAL video frame extraction for MJPEG-in-AVI — the one video container
    * a dependency-free JVM can decode end-to-end: the RIFF/AVI container is
    * a simple chunk tree, and each `##dc`/`##db` movi chunk of an MJPEG
    * stream is a complete JPEG that ImageIO's built-in reader decodes.
    * Returns (container byte offset, frame payload) per video chunk, in
    * stream order; empty for non-RIFF payloads. */
  def aviFrameChunks(bytes: Array[Byte]): Seq[(Long, Array[Byte])] = {
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def fourcc(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    val out = Seq.newBuilder[(Long, Array[Byte])]
    def walk(start: Long, end: Long): Unit = {
      var p = start
      while (p + 8 <= end) {
        val o = p.toInt
        val id = fourcc(o)
        val sz = le32(o + 4)
        val dataEnd = math.min(p + 8 + sz, end)
        if (id == "RIFF" || id == "LIST") walk(p + 12, dataEnd) // skip form type
        else if ((id.endsWith("dc") || id.endsWith("db")) && sz > 0)
          out += ((p + 8, java.util.Arrays.copyOfRange(
            bytes, (p + 8).toInt, dataEnd.toInt)))
        p += 8 + sz + (sz & 1) // chunks pad to even size
      }
    }
    if (bytes.length >= 12 && fourcc(0) == "RIFF" && fourcc(8).startsWith("AVI"))
      try walk(0, bytes.length.toLong) catch { case _: Exception => () }
    out.result()
  }

  /** REAL frame sampling over an MJPEG-AVI payload: n evenly-spaced frames
    * from the container's video chunks. None when the payload is not a
    * parseable AVI (caller falls back to the stub). */
  def sampleFramesAvi(bytes: Array[Byte], n: Int)
      : Option[Seq[(Int, Long, Array[Byte])]] = {
    val frames = aviFrameChunks(bytes)
    if (frames.isEmpty) None
    else Some((0 until n).map { f =>
      val (off, data) = frames(((frames.length.toLong * f) / n).toInt)
      (f, off, data)
    })
  }

  /** STUB frame sampling for payloads without a JVM-parseable container
    * (non-AVI video, synthetic fakes): a real implementation decodes n
    * evenly-spaced video frames; the stub slices n evenly-spaced byte
    * windows, keeping the (doc_id, frame_no, payload, offset) output shape
    * a real sampler would produce. */
  def frameSampleStub(bytes: Array[Byte], n: Int): Seq[(Int, Long, Array[Byte])] = {
    val len = math.max(bytes.length, 1)
    (0 until n).map { f =>
      val off = (len.toLong * f) / n
      val end = math.min(off + 16, bytes.length.toLong).toInt
      (f, off, bytes.slice(off.toInt, end))
    }
  }

  /** Resize as a distributed op: one output row per item, new payload +
    * dims. image/... payloads go through the REAL ImageIO scale + PNG
    * re-encode; others keep the stub contract. Same mapPartitions batch
    * shape as extractFeatures. */
  def resizeAll(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val real =
          if (m.format.startsWith("image/")) resizeImage(m.content, w, h)
          else None
        real match {
          case Some(payload) =>
            MediaItem(m.doc_id, payload, s"image/png;resized=${w}x$h",
              payload.length.toLong)
          case None =>
            val payload = resizeStub(m.content, w, h)
            MediaItem(m.doc_id, payload, m.format + s";resized=${w}x$h",
              payload.length.toLong)
        }
      }
    }
  }

  /** Frame sampling as a distributed op: fan-out n rows per item (the
    * video → frames explode a training pipeline runs before per-frame
    * feature extraction). MJPEG-AVI payloads (`video/avi`, or anything
    * with a RIFF/AVI header) take the REAL container parse — each emitted
    * payload is a complete JPEG frame; other payloads keep the stub's
    * byte-window contract. */
  def sampleFrames(items: Dataset[MediaItem], n: Int)
      : Dataset[(Long, Int, Long, Array[Byte])] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.flatMap { m =>
      sampleFramesAvi(m.content, n)
        .getOrElse(frameSampleStub(m.content, n))
        .map { case (f, off, payload) => (m.doc_id, f, off, payload) }
    }
  }

  /** (doc_id, frame_no, phash) per decodable sampled video frame — the
    * video member of the perceptual-hash family: n evenly-spaced frames
    * through the real AVI walk ([[sampleFramesAvi]]), each dHash'd like
    * a still image. Undecodable frame payloads drop (stub byte windows
    * of non-AVI payloads decode to None), never crash the pass. */
  def videoFrameHashes(items: Dataset[MediaItem], n: Int = 3): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.flatMap { m =>
      if (m.format.startsWith("video/"))
        sampleFramesAvi(m.content, n).getOrElse(Seq.empty).flatMap {
          case (f, _, payload) =>
            decodeImage(payload).map(img => (m.doc_id, f, dHash(img)))
        }
      else Seq.empty
    }.toDF("doc_id", "frame_no", "phash")
  }

  /** Near-duplicate VIDEO pairs by frame-level perceptual matching — the
    * method real video dedup uses (a re-encode/watermark/trim survives
    * frame hashing where container bytes scramble): sampled frames pair
    * up through the same banded-Hamming join as stills, restricted to
    * the SAME frame position (temporal alignment — evenly-spaced
    * sampling makes position a time-normalized key, so a trimmed copy
    * still aligns approximately), and two videos are near-dups when at
    * least `minFrames` of their sampled positions match. Scale shape:
    * everything rides the (band, key) shuffle of the frame-hash join
    * (never all-pairs), then one video-pair-sized aggregate. */
  def videoNearDups(frameHashes: DataFrame, maxHamming: Int = 3,
      minFrames: Int = 2): DataFrame = {
    require(maxHamming <= 3,
      s"4 bands guarantee recall only to Hamming 3; got $maxHamming")
    val banded = frameHashes.select(col("doc_id"), col("frame_no"),
      col("phash"), explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("key", expr("(phash >> (band * 16)) & 65535"))
    val a = banded.select(col("doc_id").as("doc_a"), col("frame_no"),
      col("phash").as("ha"), col("band"), col("key"))
    val b = banded.select(col("doc_id").as("doc_b"), col("frame_no"),
      col("phash").as("hb"), col("band"), col("key"))
    a.join(b, Seq("band", "key", "frame_no"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("frame_no"),
        expr("bit_count(ha ^ hb)").cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_matching_frames"),
        max(col("hamming")).as("max_hamming"))
      .filter(col("n_matching_frames") >= minFrames)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Oracle-checkable projection of the pipeline (byte stats are exactly
    * recomputable from the text in SQL on both engines). */
  def featureFrame(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(asMedia(documents))
      .select(col("doc_id"), col("width"), col("height"), col("checksum"),
        element_at(col("features"), 2).as("mean_byte"),
        element_at(col("features"), 3).cast("long").as("n_distinct_bytes"))
  }
}
