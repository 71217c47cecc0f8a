package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns as opaque binaries with typed
  * metadata (BASELINE.json north star; SURVEY.md §2.1 S8 / §2.4 C13).
  *
  * The IMAGE modality is fully real: JDK `javax.imageio.ImageIO`
  * PNG/JPEG decode, Java2D text overlay (the reference's C13,
  * `/root/reference/openweatherbasicmap.py:36-83`: white text with a
  * 1-px black outline at (10,10), re-encoded as PNG), pixel-histogram
  * features, and decoded width/height metadata — zero external
  * dependencies. The AUDIO modality is real for PCM WAV: JDK
  * `javax.sound.sampled` header+sample decode (rate/channels/frames/
  * duration metadata, per-segment RMS energy features). Compressed
  * audio (mp3/ogg) and video have no JDK codec and fall back to a
  * deterministic byte-level feature stub (`fakeDecode`), clearly
  * marked; swapping in a real codec changes one function, not the
  * dataflow (partition-local batched `mapPartitions`, binary payloads
  * never crossing a shuffle).
  */
object Multimodal {

  /** Canonical media-table schema: binary payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType))), nullable = true)))

  /** Build a media frame from a documents-like table: payload = UTF-8
    * bytes of the text (a deterministic stand-in for real media bytes),
    * metadata derived from content length. Test/bench scaffolding.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (length(col("text")) % 1920).cast(IntegerType).as("width"),
        (length(col("text")) % 1080).cast(IntegerType).as("height"),
        lit("fake/raw").as("format")).as("meta"))

  /** Cheap native byte-level stats (no decode): size + content hash.
    * At 100 TB this is the first pass — dedup/triage on hashes before
    * any expensive decode.
    */
  def withByteStats(df: DataFrame, binCol: String = "content"): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast(LongType))
      .withColumn("content_hash", xxhash64(col(binCol)))

  // ---------------------------------------------------------------
  // Real JDK image codec (ImageIO + Java2D) — executor-side helpers
  // used inside the batched mapPartitions operators below.
  // ---------------------------------------------------------------

  /** Set before any AWT class initializes so font/graphics work with no
    * display attached (executors are always headless), and switch
    * ImageIO to in-memory stream caches: the default is a temp FILE per
    * encode/decode — two disk round-trips per image, which at thousands
    * of images per partition turns a CPU-bound codec into an I/O-bound
    * one (measured ~3× on the q49 bench).
    */
  private lazy val initCodec: Unit = {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }
  private def ensureHeadless(): Unit = initCodec

  /** One Font per JVM — font construction/metrics resolution is
    * synchronized in the font subsystem; per-row construction serializes
    * partitions against each other.
    */
  private lazy val overlayFont =
    new java.awt.Font(java.awt.Font.SANS_SERIF, java.awt.Font.BOLD, 12)

  /** Container format from magic bytes (no decode); null if unknown. */
  private[operators] def detectFormat(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 4) return null
    val b = bytes
    if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) "jpeg"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else if (b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else null
  }

  /** ImageIO decode; null when the payload is not a decodable image
    * (the multimodal contract: undecodable rows degrade to NULL
    * metadata, they don't fail the job).
    */
  private[operators] def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    if (bytes == null) return null
    ensureHeadless()
    // NonFatal, not just IOException: the JDK plugin readers throw
    // RuntimeExceptions (ArrayIndexOutOfBounds, NegativeArraySize,
    // CMMException, …) on a corrupt body behind a valid magic header —
    // one malformed crawled image must not kill a 100 TB job
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case scala.util.control.NonFatal(_) => null }
  }

  private[operators] def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Deterministic solid-color RGB PNG — the test/bench image source
    * (the harness container has no real media files; the ENCODE side of
    * the codec is as real as the decode side, so a generated PNG
    * exercises the same ImageIO paths a crawled one would).
    */
  private[operators] def makePng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    ensureHeadless()
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(r, g, b))
    g2.fillRect(0, 0, width, height)
    g2.dispose()
    encodePng(img)
  }

  /** C13 transform (the reference's `transform_image`): draw `text` in
    * white with a 1-px black outline at (10, 10), return the image
    * re-encoded as PNG. Null for undecodable payloads.
    */
  private[operators] def overlayBytes(bytes: Array[Byte], text: String): Array[Byte] = {
    if (text == null) return null // same degrade-to-NULL contract as an undecodable payload
    val img = decodeImage(bytes)
    if (img == null) return null
    val g2 = img.createGraphics()
    g2.setFont(overlayFont)
    val yBase = 10 + g2.getFontMetrics.getAscent // PIL anchors at top-left; drawString at baseline
    // 1-px outline: the 8 neighbor offsets in black, then the main text
    for (dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0) {
      g2.setColor(java.awt.Color.BLACK)
      g2.drawString(text, 10 + dx, yBase + dy)
    }
    g2.setColor(java.awt.Color.WHITE)
    g2.drawString(text, 10, yBase)
    g2.dispose()
    encodePng(img)
  }

  /** Image features: `dim`-bin luminance histogram, normalized to sum
    * to 1 — deterministic (PNG decode is lossless) and scale-free.
    */
  private[operators] def imageFeatures(
      img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val w = img.getWidth; val h = img.getHeight
    val n = w.toLong * h
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        // integer luma (BT.601 weights scaled by 256) — exact arithmetic
        val luma = (((rgb >> 16) & 0xff) * 77 + ((rgb >> 8) & 0xff) * 150 +
          (rgb & 0xff) * 29) >> 8
        out(math.min(luma * dim / 256, dim - 1)) += 1f
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < dim) { out(i) /= n; i += 1 }
    out
  }

  // ---------------------------------------------------------------
  // Real JDK audio codec (javax.sound.sampled) — PCM WAV decode.
  // ---------------------------------------------------------------

  /** Audio SPI providers, resolved ONCE per JVM. Every
    * `AudioSystem.getAudioInputStream`/`AudioSystem.write` call walks
    * the provider registry through a `static synchronized` lookup
    * (JDK13Services.getProviders) — under a 32-thread decode loop the
    * whole stage serializes on that lock (measured ~4× on the q61
    * bench at sf1; the audio twin of ImageIO's per-call temp-file
    * cache, fixed the same way: resolve the provider once, call it
    * directly per row).
    */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
  }
  private lazy val audioWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.toSeq
  }

  /** Open a PCM WAV payload as an AudioInputStream; null when the
    * payload is not decodable PCM audio (same degrade-to-NULL contract
    * as [[decodeImage]]). JDK WAV parsing needs no audio device, so it
    * works on headless executors.
    */
  private[operators] def decodeWav(
      bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    if (bytes == null) return null
    import javax.sound.sampled.AudioFormat
    try {
      // fresh stream per reader attempt: reset() returns to the MARK a
      // prior reader set, not to position 0 — a provider that marks at a
      // non-zero offset before rejecting would make every later reader
      // parse from the wrong offset and mis-reject valid payloads
      val in = audioReaders.iterator.flatMap { r =>
        try Some(r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
      }.nextOption().orNull
      if (in == null) return null
      val enc = in.getFormat.getEncoding
      if (enc == AudioFormat.Encoding.PCM_SIGNED ||
        enc == AudioFormat.Encoding.PCM_UNSIGNED) in else { in.close(); null }
    } catch {
      // the JDK sound readers throw unchecked exceptions on malformed
      // headers, like the ImageIO readers do on corrupt bodies
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** Audio features over decoded samples: RMS energy per time segment
    * (`dim` equal slices of the sample stream) — the audio analogue of
    * the image luminance histogram: real decoded-signal statistics,
    * deterministic, fixed-size. Supports the standard SIGNED 16-bit
    * little-endian PCM layout; null (→ caller falls back) otherwise —
    * including PCM_UNSIGNED, whose samples this signed decode would
    * read maximally wrong (silence at 0x8000 → -32768), not slightly
    * wrong.
    */
  private[operators] def wavFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val in = decodeWav(bytes)
    if (in == null) return null
    try {
      val f = in.getFormat
      if (f.getSampleSizeInBits != 16 || f.isBigEndian ||
        f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return null
      val data = in.readAllBytes()
      val nSamp = data.length / 2
      if (nSamp == 0) return new Array[Float](dim)
      val sumSq = new Array[Double](dim)
      val count = new Array[Long](dim)
      var i = 0
      while (i < nSamp) {
        val s = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort / 32768.0
        val seg = math.min((i.toLong * dim / nSamp).toInt, dim - 1)
        sumSq(seg) += s * s
        count(seg) += 1
        i += 1
      }
      Array.tabulate(dim)(j =>
        if (count(j) == 0) 0f else math.sqrt(sumSq(j) / count(j)).toFloat)
    } finally in.close()
  }

  /** Synthesize a 16-bit mono PCM WAV sine tone (test/bench fixture —
    * the audio analogue of [[makePng]]).
    */
  private[operators] def makeWav(
      sampleRate: Int, nSamples: Int, freqHz: Double, amplitude: Double): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = math.round(
        math.sin(2 * math.Pi * freqHz * i / sampleRate) * amplitude * 32767).toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    // direct provider call — AudioSystem.write serializes on the
    // synchronized provider registry (see audioWriters)
    audioWriters.find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE, ais))
      .getOrElse(throw new IllegalStateException("no WAVE writer provider in this JVM"))
      .write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // ---------------------------------------------------------------
  // STUB decoder for the remaining modalities (video, compressed
  // audio) — deterministic fake features from bytes (no JDK codec; a
  // real deployment replaces this one function, the dataflow is
  // unchanged).
  // ---------------------------------------------------------------
  private[operators] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return Array.fill(dim)(0f)
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic rolling hash over bytes
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(math.floorMod(i, dim)) += (math.floorMod(h, 255L) / 255.0f - 0.5f)
      i += 1
    }
    out
  }

  /** Partition-local batched feature extraction over the binary column
    * (the Scala analogue of a `mapInPandas` decode): rows are processed
    * in batches of `batchSize` per partition — the shape a real
    * GPU/native decoder wants — and the output carries a fixed-size
    * `features: array<float>` column.
    *
    * Decodable images (PNG/JPEG via ImageIO) get REAL pixel features —
    * a normalized luminance histogram; decodable PCM WAV gets REAL
    * audio features — per-segment RMS energy; everything else (video,
    * compressed audio — no JDK codec) falls back to the deterministic
    * byte-level stub.
    *
    * Scale: decode parallelism = partitions; batching amortizes decoder
    * setup; the binary payload never crosses a shuffle.
    */
  def extractFeatures(df: DataFrame, binCol: String = "content",
      dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = false))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real decoder would run vectorized
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          val fmt = detectFormat(bytes)
          val img = if (fmt != null && fmt != "wav") decodeImage(bytes) else null
          val feats =
            if (img != null) imageFeatures(img, dim)
            else if (fmt == "wav") {
              val wf = wavFeatures(bytes, dim)
              if (wf != null) wf else fakeDecode(bytes, dim)
            } else fakeDecode(bytes, dim)
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Decode audio metadata (REAL javax.sound.sampled decode): sample
    * rate, channel count, frame count and duration from the WAV
    * header; NULLs for undecodable payloads (same contract as
    * [[decodeImageMeta]]). Appends `audio_sample_rate`,
    * `audio_channels`, `audio_frames`, `audio_duration_sec`.
    */
  def decodeAudioMeta(df: DataFrame, binCol: String = "content",
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("audio_sample_rate", DoubleType, nullable = true),
      StructField("audio_channels", IntegerType, nullable = true),
      StructField("audio_frames", LongType, nullable = true),
      StructField("audio_duration_sec", DoubleType, nullable = true)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val in = decodeWav(bytes)
        if (in == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
        else try {
          val f = in.getFormat
          val frames = in.getFrameLength
          // Seq[Any]: a bare Seq(double, int, long, double) would
          // numerically WIDEN every element to Double and break the
          // row encoder on the INT/BIGINT fields.
          // getFrameLength == AudioSystem.NOT_SPECIFIED (-1) for readers
          // that cannot determine length — degrade those two fields to
          // NULL (the documented contract), never emit a negative count
          // or duration.
          if (frames < 0)
            Row.fromSeq(r.toSeq ++ Seq[Any](
              f.getSampleRate.toDouble, f.getChannels, null, null))
          else
            Row.fromSeq(r.toSeq ++ Seq[Any](
              f.getSampleRate.toDouble, f.getChannels, frames,
              frames / f.getSampleRate.toDouble))
        } finally in.close()
      })
    }(Encoders.row(outSchema))
  }

  /** Decode image metadata (REAL ImageIO decode): width/height from the
    * decoded raster, format from magic bytes, and the top-left pixel as
    * an `rrggbb` hex probe (a dominant-color-style stat that proves the
    * raster was actually decoded); NULLs for undecodable payloads.
    * Appends `img_width`, `img_height`, `img_format`, `img_pixel00`.
    */
  def decodeImageMeta(df: DataFrame, binCol: String = "content",
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("img_width", IntegerType, nullable = true),
      StructField("img_height", IntegerType, nullable = true),
      StructField("img_format", StringType, nullable = true),
      StructField("img_pixel00", StringType, nullable = true)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val img = decodeImage(bytes)
        if (img == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
        else Row.fromSeq(r.toSeq ++ Seq(img.getWidth, img.getHeight,
          detectFormat(bytes), f"${img.getRGB(0, 0) & 0xffffff}%06x"))
      })
    }(Encoders.row(outSchema))
  }

  /** C13: binary → binary image transform, for real — per-row ImageIO
    * decode, Java2D white-on-black-outline text overlay at (10,10)
    * (parity with the reference's PIL `transform_image`), PNG
    * re-encode. `textCol` supplies the per-row overlay text; output
    * column is NULL where the payload is not a decodable image.
    */
  def overlayImage(df: DataFrame, binCol: String = "content",
      textCol: String = "overlay_text", outCol: String = "content_overlaid",
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val txt = if (r.isNullAt(txtIdx)) null else r.getString(txtIdx)
        val out = overlayBytes(r.getAs[Array[Byte]](binIdx), txt)
        Row.fromSeq(r.toSeq :+ out)
      })
    }(Encoders.row(outSchema))
  }

  /** Synthesize a solid-color PNG per row from integer columns
    * (width/height/r/g/b) — the executor-side image source for tests
    * and oracle queries (real ImageIO ENCODE; see [[makePng]]).
    * Appends `outCol` as BinaryType.
    */
  def synthesizeImages(df: DataFrame,
      wCol: String, hCol: String, rCol: String, gCol: String, bCol: String,
      outCol: String = "content", batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val idx = Seq(wCol, hCol, rCol, gCol, bCol).map(df.schema.fieldIndex)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val png = makePng(r.getInt(idx(0)), r.getInt(idx(1)),
          r.getInt(idx(2)), r.getInt(idx(3)), r.getInt(idx(4)))
        Row.fromSeq(r.toSeq :+ png)
      })
    }(Encoders.row(outSchema))
  }

  /** Deterministic 64×64 gray PATTERN image for a seed — the
    * perceptual-hash testbed [[synthesizeImages]]' solid fills can't
    * be (every block of a solid image ties at the mean): pixel
    * (x, y) has gray value
    * `((seed·2654435761 mod 1000003) + 7x + 13y) mod 256` — a
    * diagonal gradient whose phase is seed-unique, replayable in any
    * engine as plain integer arithmetic.
    */
  private[operators] def makePatternPng(seed: Long): Array[Byte] = {
    ensureHeadless()
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val base = (seed * 2654435761L) % 1000003L
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val v = ((base + 7L * x + 13L * y) % 256L).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** [[synthesizeImages]] for pattern payloads: appends `outCol` PNG
    * bytes generated from `seedCol`.
    */
  def synthesizePatternImages(df: DataFrame, seedCol: String,
      outCol: String = "content", batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val idx = df.schema.fieldIndex(seedCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        Row.fromSeq(r.toSeq :+ makePatternPng(r.getLong(idx)))
      })
    }(Encoders.row(outSchema))
  }

  /** Average-hash (aHash) of a decoded image, ALL-INTEGER: the image
    * partitions into an 8×8 grid of blocks; bit i (block index
    * by·8 + bx) is set iff 64·blockSum_i > Σ blockSums — comparing
    * scaled sums instead of divided means, so there is no rounding to
    * disagree about. Returned as 16 lowercase hex nibbles, nibble k
    * (leftmost = k 15) packing blocks 4k..4k+3 with block j at weight
    * 2^(j mod 4) — a fixed cross-engine bit recipe with no 64-bit
    * sign pitfalls. NULL for undecodable payloads; requires
    * dimensions divisible by 8.
    *
    * The luminance is the green channel — exact for the gray pattern
    * payloads and any grayscale input (PNG decode is lossless, so the
    * REAL decode here must reproduce the generator arithmetic an
    * oracle replays — a decode defect breaks the hash, which is the
    * point).
    */
  private[operators] def aHashHex(bytes: Array[Byte]): String = {
    val img = decodeImage(bytes)
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    if (w % 8 != 0 || h % 8 != 0) return null
    val bw = w / 8
    val bh = h / 8
    val sums = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (img.getRGB(x, y) >> 8) & 0xff // green channel
        sums((y / bh) * 8 + (x / bw)) += v
        x += 1
      }
      y += 1
    }
    val total = sums.sum
    val bits = sums.map(s => if (64L * s > total) 1 else 0)
    val nibbles = (15 to 0 by -1).map { k =>
      val nv = (0 until 4).map(j => bits(4 * k + j) << j).sum
      "%x".format(nv)
    }
    nibbles.mkString
  }

  /** Per-row aHash projection: appends `ahash` (16-hex string). */
  def withAHash(df: DataFrame, binCol: String = "content"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("ahash", StringType, nullable = true))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ (if (bytes == null) null else aHashHex(bytes)))
      }
    }(Encoders.row(outSchema))
  }

  /** Synthesize PCM WAV tone payloads from per-row parameter columns
    * (the audio analogue of [[synthesizeImages]]): `rateCol` (Hz),
    * `samplesCol` (frame count), `freqCol` (tone Hz), fixed 0.5
    * amplitude. Appends `outCol` as the encoded WAV bytes.
    */
  def synthesizeWavs(df: DataFrame,
      rateCol: String, samplesCol: String, freqCol: String,
      outCol: String = "content", batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val idx = Seq(rateCol, samplesCol, freqCol).map(df.schema.fieldIndex)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val wav = makeWav(r.getInt(idx(0)), r.getInt(idx(1)),
          r.getInt(idx(2)).toDouble, amplitude = 0.5)
        Row.fromSeq(r.toSeq :+ wav)
      })
    }(Encoders.row(outSchema))
  }

  /** "Frame sampling": take `n` evenly-spaced fixed-width byte windows
    * from the payload (stand-in for video frame extraction) — native
    * `substring` on binary, no decode, fully codegen'd.
    */
  def sampleFrames(df: DataFrame, binCol: String = "content",
      n: Int = 4, frameBytes: Int = 32): DataFrame = {
    val total = length(col(binCol))
    val step = greatest((total - lit(frameBytes)) / lit(math.max(n - 1, 1)), lit(1))
    df.withColumn("frames",
      transform(sequence(lit(0), lit(n - 1)),
        i => substring(col(binCol), (i * step + 1).cast(IntegerType), lit(frameBytes))))
  }

  /** "Resize" (byte-level stand-in): truncate/pad the payload to a
    * target byte budget. The REAL image path is [[resizeImage]]; this
    * stub remains for non-image binaries (video — no JDK codec).
    */
  def resizeStub(df: DataFrame, binCol: String = "content", targetBytes: Int = 256): DataFrame =
    df.withColumn("content_resized", substring(col(binCol), 1, targetBytes))

  private[operators] def resizeBytes(
      bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = decodeImage(bytes)
    if (img == null || w <= 0 || h <= 0) null
    else {
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = dst.createGraphics()
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(img, 0, 0, w, h, null)
      g2.dispose()
      encodePng(dst)
    }
  }

  /** REAL image resize: per-row ImageIO decode → Java2D bilinear
    * scale to (`wCol`, `hCol`) → PNG re-encode, in the same batched
    * `mapPartitions` shape as [[overlayImage]] (the shape a Pandas-UDF
    * pipeline would use; here it stays JVM-native). NULL where the
    * payload is not a decodable image. The thumbnail/normalize step of
    * a multimodal training pipeline — a resolution-normalized corpus
    * is what vision towers train on.
    */
  def resizeImage(df: DataFrame, binCol: String = "content",
      wCol: String = "target_w", hCol: String = "target_h",
      outCol: String = "content_resized", batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val wIdx = df.schema.fieldIndex(wCol)
    val hIdx = df.schema.fieldIndex(hCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val out = resizeBytes(r.getAs[Array[Byte]](binIdx),
          r.getInt(wIdx), r.getInt(hIdx))
        Row.fromSeq(r.toSeq :+ out)
      })
    }(Encoders.row(outSchema))
  }

  /** C13: binary → binary transform (the reference draws a text overlay
    * on a PNG tile, `openweatherbasicmap.py:36-83`). STUB: prepends a
    * deterministic tag to the payload — the dataflow shape (binary in,
    * binary out, per-row, codegen-able concat) is the real thing; a real
    * decoder+drawer slots into [[extractFeatures]]'s batch loop instead.
    */
  def overlayStub(df: DataFrame, binCol: String = "content", tag: String = "OVERLAY:"): DataFrame =
    df.withColumn("content_overlaid",
      concat(encode(lit(tag), "UTF-8"), col(binCol)))

  // ---------------------------------------------------------------
  // Sample-exact audio path: integer waveform synth → real WAV
  // encode → real JDK decode → per-frame features. Unlike the sine
  // path ([[synthesizeWavs]]), whose float samples an independent
  // engine cannot replay bit-for-bit (libm sin ulp differences land
  // on rounding boundaries), the triangle wave is PURE INTEGER
  // arithmetic — so a cross-engine oracle can regenerate every
  // sample and the encode→decode round-trip is proven at the sample
  // level, not just the header level.
  // ---------------------------------------------------------------

  /** Integer triangle-wave sample: amplitude A, sample rate r,
    * frequency f, index i — `|((i·f·4A) div r) mod 4A − 2A| − A`,
    * range [−A, A]. Exactly replayable in any engine with 64-bit
    * integer div/mod.
    */
  private[graft] def triSample(i: Long, freq: Long, rate: Long, amp: Long): Int =
    (math.abs((i * freq * 4 * amp / rate) % (4 * amp) - 2 * amp) - amp).toInt

  /** Synthesize PCM WAV payloads carrying the integer triangle wave
    * (amplitude 16000, well inside int16). Columns as
    * [[synthesizeWavs]]: `rateCol` (Hz), `samplesCol`, `freqCol`.
    */
  def synthesizeTriangleWavs(df: DataFrame,
      rateCol: String, samplesCol: String, freqCol: String,
      outCol: String = "content", batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val idx = Seq(rateCol, samplesCol, freqCol).map(df.schema.fieldIndex)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val rate = r.getInt(idx(0))
        val n = r.getInt(idx(1))
        val freq = r.getInt(idx(2))
        val data = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = triSample(i.toLong, freq.toLong, rate.toLong, 16000L)
          data(2 * i) = (v & 0xff).toByte
          data(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
        val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
        val ais = new AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        audioWriters.find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE, ais))
          .getOrElse(throw new IllegalStateException(
            "no WAVE writer provider in this JVM"))
          .write(ais, AudioFileFormat.Type.WAVE, bos)
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      })
    }(Encoders.row(outSchema))
  }

  /** Decode a 16-bit mono little-endian PCM WAV payload back to its
    * signed sample values (`samples: array<int>`, null when the
    * payload is not such a WAV). The REAL JDK codec parses the
    * container — a sample emitted here went through encode→decode
    * byte-for-byte.
    */
  def decodePcmSamples(df: DataFrame, binCol: String = "content",
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("samples", ArrayType(IntegerType), nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val in = decodeWav(r.getAs[Array[Byte]](binIdx))
        val out: Seq[Int] =
          if (in == null) null
          else try {
            val f = in.getFormat
            if (f.getSampleSizeInBits != 16 || f.isBigEndian ||
              f.getChannels != 1 ||
              f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
              null
            else {
              val bytes = in.readAllBytes()
              Array.tabulate(bytes.length / 2) { i =>
                ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
              }.toSeq
            }
          } finally in.close()
        Row.fromSeq(r.toSeq :+ out)
      })
    }(Encoders.row(outSchema))
  }

  /** Frame-level audio features over a decoded sample array, all
    * native integer expressions (no UDF): total energy (Σx²),
    * zero-crossing count (strict sign flips), full-frame count, and
    * the max per-frame energy. Partial trailing frames are excluded
    * from the per-frame max (documented contract) but included in
    * the total.
    */
  def audioFrameFeatures(df: DataFrame, samplesCol: String = "samples",
      frameSize: Int = 400): DataFrame = {
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    val s = samplesCol
    df
      .withColumn("n_samples", size(col(s)).cast(LongType))
      .withColumn("n_frames", expr(s"size($s) div $frameSize").cast(LongType))
      .withColumn("total_energy", expr(
        s"aggregate($s, CAST(0 AS BIGINT), (acc, x) -> acc + CAST(x AS BIGINT) * x)"))
      .withColumn("zcr", when(size(col(s)) >= 2, expr(
        s"CAST(size(filter(sequence(2, size($s)), i -> element_at($s, i - 1) * element_at($s, i) < 0)) AS BIGINT)"))
        .otherwise(lit(0L)))
      .withColumn("max_frame_energy", when(expr(s"size($s) div $frameSize") > 0,
        expr(s"array_max(transform(sequence(0, size($s) div $frameSize - 1), " +
          s"f -> aggregate(slice($s, f * $frameSize + 1, $frameSize), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + CAST(x AS BIGINT) * x)))"))
        .otherwise(lit(null).cast(LongType)))
  }
}
