package graft.ext

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and expensive per-item decoding
  * runs batched inside `mapPartitions` — the Scala analogue of a
  * batch-shaped Pandas UDF.
  *
  * IMAGES decode for real ([[decodeImages]]/[[resizeImages]] via the
  * JDK's `javax.imageio` — PNG/JPEG/BMP/GIF, no external libraries),
  * and so does AUDIO ([[decodeAudio]] via `javax.sound.sampled` —
  * WAV/AIFF/AU PCM). Video codecs aren't in the JDK, so the generic
  * frame-metadata decode stays STUBBED:
  * `decodeBatchStub` derives deterministic fake dimensions from the
  * leading bytes, so the surrounding plumbing — schema, batch shape,
  * partition parallelism, digest computation — is real and testable
  * end-to-end and a JNI/FFI codec drops straight in.
  *
  * At 100 TB: media rows are large, so the table is stored with the
  * binary column in its own parquet column chunk (column pruning skips it
  * unless decoded), partitioned so one batch of `BatchSize` payloads fits
  * executor memory; decode is a map-only stage.
  */
object Multimodal {

  final case class MediaRow(id: Long, content: Array[Byte], mime: String)
  final case class MediaMeta(
      id: Long, byteLen: Int, width: Int, height: Int, frames: Int,
      digest: String)

  implicit val mediaRowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val mediaMetaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]

  /** payloads per decode batch — sized so a batch of decoded frames fits
    * comfortably in executor memory
    */
  val BatchSize = 64

  /** STUB decoder: a real implementation hands the whole batch to a codec
    * (JNI/FFI) and returns per-item metadata. The fake is deterministic
    * in the payload bytes so tests and oracles can replicate it:
    *   width  = 1 + (b0*256 + b1) mod 1024
    *   height = 1 + (b1*256 + b2) mod 768
    *   frames = 1 + byteLen mod 100
    */
  def decodeBatchStub(batch: Seq[MediaRow]): Seq[MediaMeta] = batch.map { m =>
    val b = m.content
    def u(i: Int): Int = if (b.length > i) b(i) & 0xFF else 0
    MediaMeta(
      id = m.id,
      byteLen = b.length,
      width = 1 + (u(0) * 256 + u(1)) % 1024,
      height = 1 + (u(1) * 256 + u(2)) % 768,
      frames = 1 + b.length % 100,
      digest = md5Hex(b))
  }

  /** batched decode over partitions — the real Spark-side shape */
  def decodeMeta(ds: Dataset[MediaRow]): Dataset[MediaMeta] =
    ds.mapPartitions(_.grouped(BatchSize).flatMap(decodeBatchStub))

  /** frame-sampling stub: pick ~8 evenly spaced frame indices */
  def sampleFrames(meta: MediaMeta, target: Int = 8): Seq[Int] = {
    val step = math.max(1, meta.frames / target)
    (0 until meta.frames by step).toSeq
  }

  final case class MediaFeature(id: Long, feature: Array[Double])
  implicit val mediaFeatureEnc: Encoder[MediaFeature] =
    Encoders.product[MediaFeature]

  /** STUB feature extractor: a deterministic `dims`-dim embedding —
    * per dimension j, the mean of bytes at positions j, j+dims, … scaled
    * to [0,1]. A real implementation hands the batch to a vision/audio
    * encoder (JNI/FFI); the batch shape, schema and partition
    * parallelism here are the real pipeline plumbing.
    */
  def featureBatchStub(batch: Seq[MediaRow], dims: Int = 8): Seq[MediaFeature] =
    batch.map { m =>
      val b = m.content
      val f = Array.tabulate(dims) { j =>
        var s = 0L
        var c = 0
        var i = j
        while (i < b.length) { s += (b(i) & 0xFF); i += dims; c += 1 }
        if (c == 0) 0.0 else s.toDouble / c / 255.0
      }
      MediaFeature(m.id, f)
    }

  /** batched feature extraction over partitions */
  def extractFeatures(ds: Dataset[MediaRow], dims: Int = 8): Dataset[MediaFeature] =
    ds.mapPartitions(_.grouped(BatchSize).flatMap(featureBatchStub(_, dims)))

  def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  // ---- real image codec path (JDK javax.imageio — no external deps) ----

  /** decoded image metadata + a sampled mean color; width/height = -1
    * flags an undecodable payload (kept, not dropped — corrupt media is
    * data to quarantine downstream, not an exception to kill a stage)
    */
  final case class ImageMeta(id: Long, byteLen: Int, width: Int,
      height: Int, format: String, avgR: Double, avgG: Double,
      avgB: Double, digest: String)
  implicit val imageMetaEnc: Encoder[ImageMeta] = Encoders.product[ImageMeta]

  /** per-batch codec init: AWT stays headless, and javax.imageio's
    * stream cache stays IN MEMORY — ImageIO's default disk cache
    * creates and deletes a temp file for EVERY read/write, which
    * collapses under 32 concurrent decode tasks (observed 3 s → 70 s
    * across repeated runs as the tmp dir churns). Every payload here is
    * an in-memory byte array, so the memory cache is strictly better.
    * Both are cheap idempotent static stores, safe per batch on any
    * executor JVM.
    */
  private def headless(): Unit = {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** container format from magic bytes (cheap, no decode) */
  def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N'
      && b(3) == 'G') "png"
    else if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8)
      "jpeg"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else "unknown"

  /** REAL batched image decode via `javax.imageio` (PNG/JPEG/BMP/GIF —
    * everything the JDK decodes, zero external dependencies): true
    * dimensions plus a mean color sampled on a ≤32×32 grid, so cost per
    * image is bounded regardless of resolution. Same mapPartitions
    * batch shape as the stub path — swap-in proof that the plumbing is
    * codec-ready.
    */
  def decodeImageBatch(batch: Seq[MediaRow]): Seq[ImageMeta] = {
    headless()
    batch.map { m =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
        catch { case _: Exception => null }
      if (img == null)
        ImageMeta(m.id, m.content.length, -1, -1, sniffFormat(m.content),
          -1.0, -1.0, -1.0, md5Hex(m.content))
      else {
        val w = img.getWidth; val h = img.getHeight
        val sx = math.max(1, w / 32); val sy = math.max(1, h / 32)
        var r = 0L; var g = 0L; var b = 0L; var c = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
            c += 1; x += sx
          }
          y += sy
        }
        ImageMeta(m.id, m.content.length, w, h, sniffFormat(m.content),
          r.toDouble / c, g.toDouble / c, b.toDouble / c, md5Hex(m.content))
      }
    }
  }

  /** batched real decode over partitions */
  def decodeImages(ds: Dataset[MediaRow]): Dataset[ImageMeta] =
    ds.mapPartitions(_.grouped(BatchSize).flatMap(decodeImageBatch))

  /** REAL batched resize (headless Graphics2D, bilinear) re-encoded as
    * PNG — the thumbnail/normalize stage of an image-curation pipeline.
    * Undecodable payloads pass through unchanged (quarantine semantics,
    * matching [[decodeImageBatch]]).
    */
  def resizeImageBatch(batch: Seq[MediaRow], w: Int, h: Int): Seq[MediaRow] = {
    headless()
    batch.map { m =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
        catch { case _: Exception => null }
      if (img == null) m
      else {
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val gfx = out.createGraphics()
        gfx.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        gfx.drawImage(img, 0, 0, w, h, null)
        gfx.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        MediaRow(m.id, bos.toByteArray, "image/png")
      }
    }
  }

  /** batched resize over partitions */
  def resizeImages(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] =
    ds.mapPartitions(_.grouped(BatchSize).flatMap(resizeImageBatch(_, w, h)))

  // ---- real audio codec path (JDK javax.sound.sampled — WAV/PCM) ----

  /** decoded audio metadata + exact signal statistics over the PCM
    * samples; sampleRate = -1 flags an undecodable payload (quarantine
    * semantics, as with images)
    */
  final case class AudioMeta(id: Long, byteLen: Int, sampleRate: Int,
      channels: Int, frames: Long, rms: Double, peak: Double,
      digest: String)
  implicit val audioMetaEnc: Encoder[AudioMeta] = Encoders.product[AudioMeta]

  /** REAL batched audio decode via `javax.sound.sampled` (WAV/AIFF/AU
    * PCM — the formats the JDK decodes without external codecs): true
    * sample rate / channel count / frame count plus exact RMS and peak
    * amplitude of the 16-bit samples, normalized to [0,1]. Same
    * mapPartitions batch shape as every other decode path.
    */
  def decodeAudioBatch(batch: Seq[MediaRow]): Seq[AudioMeta] = batch.map { m =>
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.content))
      catch { case _: Exception => null }
    if (in == null)
      AudioMeta(m.id, m.content.length, -1, -1, -1L, -1.0, -1.0,
        md5Hex(m.content))
    else if (!isPcm16(in.getFormat)) {
      // only 16-bit signed PCM is decoded below: 8/24-bit or float WAVs
      // would yield silently wrong rms/peak/frames — quarantine like any
      // other undecodable payload
      in.close()
      AudioMeta(m.id, m.content.length, -1, -1, -1L, -1.0, -1.0,
        md5Hex(m.content))
    } else {
      val f = in.getFormat
      val data = in.readAllBytes()
      in.close()
      var i = 0
      var sumSq = 0.0
      var peak = 0L
      var n = 0L
      // 16-bit signed PCM; respect the container's endianness
      val big = f.isBigEndian
      while (i + 1 < data.length) {
        val s =
          if (big) ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort
          else ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort
        sumSq += s.toDouble * s.toDouble
        if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
        n += 1
        i += 2
      }
      AudioMeta(m.id, m.content.length,
        f.getSampleRate.toInt, f.getChannels,
        n / math.max(f.getChannels, 1),
        if (n == 0) 0.0 else math.sqrt(sumSq / n) / 32768.0,
        peak.toDouble / 32768.0,
        md5Hex(m.content))
    }
  }

  /** batched real audio decode over partitions */
  def decodeAudio(ds: Dataset[MediaRow]): Dataset[AudioMeta] =
    ds.mapPartitions(_.grouped(BatchSize).flatMap(decodeAudioBatch))

  /** 64-bit audio fingerprint: split the PCM samples into 65 equal
    * windows, take each window's mean absolute amplitude, and set bit w
    * when energy(w+1) > energy(w) — the energy-gradient skeleton of a
    * chromaprint-style fingerprint (robust to gain and resampling,
    * since only the energy ORDER between neighboring windows matters).
    * One map pass; dedup reuses the 8-byte group/banding shapes.
    * Undecodable payloads hash to -1.
    */
  /** the one sample layout the PCM loops below decode correctly */
  private def isPcm16(f: javax.sound.sampled.AudioFormat): Boolean =
    f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
      f.getSampleSizeInBits == 16

  def audioFingerprintBatch(batch: Seq[MediaRow]): Seq[ImageHash] =
    batch.map { m =>
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(m.content))
        catch { case _: Exception => null }
      if (in == null) ImageHash(m.id, -1L)
      else if (!isPcm16(in.getFormat)) { in.close(); ImageHash(m.id, -1L) }
      else {
        val big = in.getFormat.isBigEndian
        val data = in.readAllBytes()
        in.close()
        val n = data.length / 2
        if (n < 65) ImageHash(m.id, -1L)
        else {
          val energy = new Array[Double](65)
          var w = 0
          while (w < 65) {
            val from = (n.toLong * w / 65).toInt
            val to = (n.toLong * (w + 1) / 65).toInt
            var s = 0.0
            var i = from
            while (i < to) {
              val v =
                if (big) ((data(2 * i) << 8) | (data(2 * i + 1) & 0xFF)).toShort
                else ((data(2 * i + 1) << 8) | (data(2 * i) & 0xFF)).toShort
              s += math.abs(v.toDouble)
              i += 1
            }
            energy(w) = if (to > from) s / (to - from) else 0.0
            w += 1
          }
          var hash = 0L
          var k = 0
          while (k < 64) {
            if (energy(k + 1) > energy(k)) hash |= 1L << k
            k += 1
          }
          ImageHash(m.id, hash)
        }
      }
    }

  /** batched audio fingerprints over partitions */
  def audioFingerprints(ds: Dataset[MediaRow]): Dataset[ImageHash] =
    ds.mapPartitions(_.grouped(BatchSize).flatMap(audioFingerprintBatch))

  /** exact audio-duplicate groups (min-id keeper), the audio face of
    * [[dHashGroups]]
    */
  def audioFingerprintGroups(ds: Dataset[MediaRow]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    audioFingerprints(ds).toDF()
      .filter(col("dhash") =!= -1L)
      .groupBy("dhash")
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("keeper"))
  }

  /** deterministic amplitude-patterned test WAV: 65 windows of 100
    * samples whose amplitudes cycle with the window index, phase-shifted
    * by `id mod 4` — four distinct fingerprints, group = id mod 4 (the
    * audio analogue of [[syntheticPatternPng]])
    */
  def syntheticPatternWav(id: Long, sampleRate: Int = 8000): Array[Byte] = {
    val phase = (id % 4).toInt
    val frames = 65 * 100
    val pcm = new Array[Byte](frames * 2)
    var w = 0
    while (w < 65) {
      val v = (((w + phase) * 700) % 8000).toShort
      var i = 0
      while (i < 100) {
        val idx = w * 100 + i
        val s = if (idx % 2 == 0) v else (-v).toShort
        pcm(idx * 2) = (s & 0xFF).toByte
        pcm(idx * 2 + 1) = ((s >> 8) & 0xFF).toByte
        i += 1
      }
      w += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** deterministic square-wave test WAV (id → amplitude & length):
    * every sample is ±v with v = (1 + id mod 9) · 3000, so RMS and peak
    * are EXACTLY v / 32768 — decoded statistics become a pure formula
    * of the id, which is what lets an SQL oracle check the codec path
    */
  def syntheticWav(id: Long, sampleRate: Int = 8000): Array[Byte] = {
    val frames = 800 + (id % 5).toInt * 80
    val v = ((1 + id % 9) * 3000).toShort
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = if (i % 2 == 0) v else (-v).toShort
      pcm(i * 2) = (s & 0xFF).toByte          // little-endian
      pcm(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // ---- real video container demux (ISO BMFF / MP4 box parsing) ----

  /** MP4/QuickTime container metadata: movie duration (from `mvhd`) and
    * track dimensions (from `tkhd`), demuxed by walking the ISO BMFF
    * box structure — REAL byte-format parsing (the container layer a
    * corpus pipeline filters on), no frame decode (the JDK ships no
    * video codec; a JNI codec plugs into the same batch shape).
    * brand = "" / durationMs = -1 flags an unparseable payload.
    */
  final case class VideoMeta(id: Long, byteLen: Int, brand: String,
      timescale: Long, durationMs: Long, width: Int, height: Int,
      digest: String)
  implicit val videoMetaEnc: Encoder[VideoMeta] = Encoders.product[VideoMeta]

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  /** walk the boxes of `[from, to)`, calling `f(type, bodyFrom, bodyTo)` */
  private def walkBoxes(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var i = from
    while (i + 8 <= to) {
      val size = be32(b, i)
      if (size < 8 || i + size > to) return // malformed: stop cleanly
      val tpe = new String(b, i + 4, 4, "ISO-8859-1")
      f(tpe, i + 8, i + size.toInt)
      i += size.toInt
    }
  }

  /** REAL batched MP4 demux over partitions */
  def demuxMp4Batch(batch: Seq[MediaRow]): Seq[VideoMeta] = batch.map { m =>
    val b = m.content
    var brand = ""
    var timescale = 0L
    var duration = 0L
    var width = 0
    var height = 0
    try {
      walkBoxes(b, 0, b.length) {
        case ("ftyp", s, _) if s + 4 <= b.length =>
          brand = new String(b, s, 4, "ISO-8859-1")
        case ("moov", ms, me) =>
          walkBoxes(b, ms, me) {
            case ("mvhd", s, e) if b(s) == 0 && s + 20 <= e =>
              // v0: ver/flags, ctime, mtime, timescale, duration
              timescale = be32(b, s + 12)
              duration = be32(b, s + 16)
            case ("trak", ts, te) =>
              walkBoxes(b, ts, te) {
                case ("tkhd", s, e) if b(s) == 0 && s + 84 <= e =>
                  // v0 fixed layout: width/height are 16.16 at +76/+80
                  width = (be32(b, s + 76) >> 16).toInt
                  height = (be32(b, s + 80) >> 16).toInt
                case _ =>
              }
            case _ =>
          }
        case _ =>
      }
    } catch { case _: Exception => brand = "" }
    if (brand.isEmpty || timescale == 0)
      VideoMeta(m.id, b.length, "", -1L, -1L, -1, -1, md5Hex(b))
    else
      VideoMeta(m.id, b.length, brand, timescale,
        duration * 1000L / timescale, width, height, md5Hex(b))
  }

  def demuxMp4(ds: Dataset[MediaRow]): Dataset[VideoMeta] =
    ds.mapPartitions(_.grouped(BatchSize).flatMap(demuxMp4Batch))

  /** deterministic minimal MP4 (ftyp + moov(mvhd + trak(tkhd))): movie
    * duration and track dimensions are pure formulas of the id, so the
    * demux path has an SQL oracle
    */
  def syntheticMp4(id: Long): Array[Byte] = {
    val timescale = 1000L
    val duration = 1000L + (id % 60) * 500L        // ms, since ts=1000
    val w = 160 + (id % 8).toInt * 16
    val h = 120 + (id % 6).toInt * 16
    def box(tpe: String, body: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + body.length)
      val size = out.length.toLong
      out(0) = ((size >> 24) & 0xFF).toByte; out(1) = ((size >> 16) & 0xFF).toByte
      out(2) = ((size >> 8) & 0xFF).toByte; out(3) = (size & 0xFF).toByte
      tpe.getBytes("ISO-8859-1").copyToArray(out, 4)
      body.copyToArray(out, 8)
      out
    }
    def u32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val ftyp = box("ftyp", u32(0x69736F6DL) ++ u32(0) ++ u32(0x69736F6DL))
    val mvhd = box("mvhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(timescale) ++ u32(duration) ++
        Array.fill[Byte](80)(0))
    val tkhd = box("tkhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(duration) ++
        Array.fill[Byte](52)(0) ++ u32(w.toLong << 16) ++ u32(h.toLong << 16))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ moov
  }

  // ---- perceptual image dedup (dHash over the real decode path) ----

  final case class ImageHash(id: Long, dhash: Long)
  implicit val imageHashEnc: Encoder[ImageHash] = Encoders.product[ImageHash]

  /** 64-bit difference hash of an image: resample to 9×8 (bilinear,
    * the real [[resizeImageBatch]] path), take the standard luma of
    * each pixel, and set bit (x, y) when luma(x+1, y) > luma(x, y) —
    * the classic perceptual fingerprint: robust to re-encoding and
    * rescaling, cheap enough for a corpus-wide map pass. Undecodable
    * payloads hash to -1 (quarantine).
    */
  /** the dHash kernel over an already-decoded image */
  private def dHashOf(img: java.awt.image.BufferedImage): Long = {
    val out = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gfx = out.createGraphics()
    gfx.setRenderingHint(
      java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    gfx.drawImage(img, 0, 0, 9, 8, null)
    gfx.dispose()
    def luma(x: Int, y: Int): Double = {
      val p = out.getRGB(x, y)
      0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) +
        0.114 * (p & 0xFF)
    }
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(x + 1, y) > luma(x, y)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  def dHashBatch(batch: Seq[MediaRow]): Seq[ImageHash] = {
    headless()
    batch.map { m =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
        catch { case _: Exception => null }
      if (img == null) ImageHash(m.id, -1L)
      else ImageHash(m.id, dHashOf(img))
    }
  }

  /** batched dHash over partitions — one corpus map pass */
  def dHashes(ds: Dataset[MediaRow]): Dataset[ImageHash] =
    ds.mapPartitions(_.grouped(BatchSize).flatMap(dHashBatch))

  /** Exact perceptual-duplicate groups: images sharing a dHash collapse
    * to (keeper = min id, cnt) — the image face of
    * [[Dedup.exactGroups]]'s one-shuffle shape. For near-duplicates at
    * hamming ≤ 3, band the 64-bit hash exactly as
    * [[Dedup.simhashPairs]] does (the pigeonhole blocking is
    * hash-agnostic).
    */
  def dHashGroups(ds: Dataset[MediaRow]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    dHashes(ds).toDF()
      .filter(col("dhash") =!= -1L)
      .groupBy("dhash")
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("keeper"))
  }

  /** deterministic horizontally-striped test PNG: pixel gray level
    * cycles with x, phase-shifted by `id mod 4` — the four phases give
    * four distinct dHashes, so perceptual grouping has a pure-formula
    * oracle (group = id mod 4)
    */
  def syntheticPatternPng(id: Long): Array[Byte] = {
    headless()
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val phase = (id % 4).toInt
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val g = ((x + phase) * 40) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ---- REAL video frame decode: MJPEG-in-AVI (pure JDK) ----
  // MJPEG is the one video codec the JDK can decode without native
  // libraries: every frame is an ordinary JPEG inside a RIFF-AVI
  // container. The RIFF walk below is a real container parser (chunk
  // sizes, LIST nesting, even-byte padding), and each frame goes
  // through the real `javax.imageio` JPEG decoder — this closes the
  // frame-decode gap for MJPEG; other codecs (H.264 etc.) remain
  // honestly out of JDK reach.

  final case class VideoFrame(id: Long, frameIdx: Int, width: Int,
      height: Int, lumaBucket: Int)
  implicit val videoFrameEnc: Encoder[VideoFrame] =
    Encoders.product[VideoFrame]

  private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def fourCC(b: Array[Byte], off: Int): String =
    if (off + 4 <= b.length)
      new String(b, off, 4, "ISO-8859-1")
    else ""

  /** the first video stream's BITMAPINFOHEADER essentials: biWidth,
    * biHeight (NEGATIVE = top-down row order, per the DIB spec),
    * biBitCount, and biCompression (0 = BI_RGB uncompressed)
    */
  private final case class AviVideoFormat(
      width: Int, height: Int, bitCount: Int, compression: Long)

  private def leS32(b: Array[Byte], off: Int): Int = leU32(b, off).toInt

  /** Frame payloads of an AVI's `movi` list in stream order (chunk ids
    * `##dc`/`##db`), plus the video stream format from the `strl`
    * header pair (None when absent — decode then falls back to the
    * compressed-payload path). None overall when the container is
    * malformed.
    */
  private def aviParse(b: Array[Byte])
      : Option[(Option[AviVideoFormat], Seq[Array[Byte]])] = try {
    if (b.length < 12 || fourCC(b, 0) != "RIFF" || fourCC(b, 8) != "AVI ")
      return None
    val frames = Seq.newBuilder[Array[Byte]]
    var fmt: Option[AviVideoFormat] = None
    var vidsStream = false // last strh in this strl was a video stream
    def walk(from: Int, to: Int, inMovi: Boolean): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val id = fourCC(b, i)
        val size = leU32(b, i + 4)
        val dataStart = i + 8
        // bounds-check in Long BEFORE narrowing: leU32 is 0..2^32-1, so a
        // chunk size near 2^31 would wrap negative as an Int and slip past
        // an Int comparison against `to`
        if (size > (to - dataStart).toLong) return false
        val dataEnd = dataStart + size.toInt
        if (id == "LIST") {
          val listType = fourCC(b, dataStart)
          if (!walk(dataStart + 4, dataEnd, inMovi || listType == "movi"))
            return false
        } else if (id == "strh" && size >= 4) {
          vidsStream = fourCC(b, dataStart) == "vids"
        } else if (id == "strf" && vidsStream && fmt.isEmpty && size >= 20) {
          // BITMAPINFOHEADER: size(4) width(4) height(4) planes(2)
          // bitCount(2) compression(4) ...
          fmt = Some(AviVideoFormat(
            leS32(b, dataStart + 4), leS32(b, dataStart + 8),
            ((b(dataStart + 14) & 0xFF) | ((b(dataStart + 15) & 0xFF) << 8)),
            leU32(b, dataStart + 16)))
        } else if (inMovi && size > 0 &&
          (id.endsWith("dc") || id.endsWith("db"))) {
          frames += java.util.Arrays.copyOfRange(b, dataStart, dataEnd)
        }
        i = dataEnd + (size.toInt & 1) // chunks pad to even byte counts
      }
      true
    }
    if (walk(12, b.length, inMovi = false)) Some((fmt, frames.result()))
    else None
  } catch {
    // any surviving parse error on an adversarial container quarantines
    // as malformed rather than failing the Spark task
    case scala.util.control.NonFatal(_) => None
  }

  /** Decode one raw BI_RGB DIB frame payload: bottom-up (or top-down
    * when biHeight < 0) BGR(A) rows, each padded to a 4-byte stride —
    * the UNCOMPRESSED AVI codec, decodable with no codec library at
    * all. Returns null (→ frame quarantine) on any geometry/size
    * mismatch rather than guessing.
    */
  private def decodeDib(p: Array[Byte],
      f: AviVideoFormat): java.awt.image.BufferedImage = {
    val bpx = f.bitCount / 8
    val w = f.width
    val hAbs = math.abs(f.height)
    if ((bpx != 3 && bpx != 4) || w <= 0 || hAbs <= 0) return null
    val stride = ((w * bpx + 3) / 4) * 4
    if (p.length.toLong < stride.toLong * hAbs) return null
    val img = new java.awt.image.BufferedImage(w, hAbs,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < hAbs) {
      val srcRow = if (f.height > 0) hAbs - 1 - y else y
      val ro = srcRow * stride
      var x = 0
      while (x < w) {
        val o = ro + x * bpx
        img.setRGB(x, y, ((p(o + 2) & 0xFF) << 16) |
          ((p(o + 1) & 0xFF) << 8) | (p(o) & 0xFF))
        x += 1
      }
      y += 1
    }
    img
  }

  /** one AVI frame payload → image: raw DIB when the stream header says
    * BI_RGB, otherwise the compressed path (javax.imageio — MJPEG);
    * null = undecodable (quarantine)
    */
  private def decodeAviPayload(payload: Array[Byte],
      fmt: Option[AviVideoFormat]): java.awt.image.BufferedImage =
    fmt match {
      case Some(f) if f.compression == 0L => decodeDib(payload, f)
      case _ =>
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
    }

  /** Real per-frame decode of MJPEG-AVI payloads: container walk +
    * `javax.imageio` JPEG decode per frame; returns one row per frame
    * with decoded dimensions and the mean-luma bucket (luma/16 — JPEG's
    * DC quantization moves a solid tone by ±2, so bucket-center colors
    * survive the codec round-trip exactly). Malformed containers and
    * undecodable frames quarantine as (frameIdx = -1) sentinel rows.
    */
  def decodeAviFramesBatch(batch: Seq[MediaRow]): Seq[VideoFrame] = {
    headless()
    batch.flatMap { m =>
      aviParse(m.content) match {
        case None => Seq(VideoFrame(m.id, -1, -1, -1, -1))
        case Some((_, chunks)) if chunks.isEmpty =>
          Seq(VideoFrame(m.id, -1, -1, -1, -1))
        case Some((fmt, chunks)) => chunks.zipWithIndex.map { case (jp, i) =>
          val img = decodeAviPayload(jp, fmt)
          if (img == null) VideoFrame(m.id, -1, -1, -1, -1)
          else {
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xFF
                val g = (rgb >> 8) & 0xFF
                val bl = rgb & 0xFF
                sum += (r * 299 + g * 587 + bl * 114) / 1000
                x += 1
              }
              y += 1
            }
            val mean = sum.toDouble / (img.getWidth * img.getHeight)
            VideoFrame(m.id, i, img.getWidth, img.getHeight,
              (mean / 16.0).toInt)
          }
        }
      }
    }
  }

  /** batched real MJPEG frame decode over partitions */
  def decodeAviFrames(ds: Dataset[MediaRow]): Dataset[VideoFrame] =
    ds.mapPartitions(_.grouped(BatchSize).flatMap(decodeAviFramesBatch))

  // ---- perceptual video dedup: real frame decode × dHash ----

  final case class VideoFrameHash(id: Long, frameIdx: Int, dhash: Long)
  implicit val videoFrameHashEnc: Encoder[VideoFrameHash] =
    Encoders.product[VideoFrameHash]

  /** Per-frame dHash of MJPEG-AVI payloads: the real RIFF walk finds
    * each JPEG frame, the [[dHashOf]] kernel fingerprints the decoded
    * image. Quarantine is keyed on `frameIdx = -1` (malformed container
    * or undecodable frame), NOT on the hash value — a legitimate frame
    * whose gradient pattern hashes to -1 keeps its place in the
    * signature.
    */
  def videoFrameHashesBatch(batch: Seq[MediaRow]): Seq[VideoFrameHash] = {
    headless()
    batch.flatMap { m =>
      aviParse(m.content) match {
        case None => Seq(VideoFrameHash(m.id, -1, -1L))
        case Some((_, chunks)) if chunks.isEmpty =>
          Seq(VideoFrameHash(m.id, -1, -1L))
        case Some((fmt, chunks)) => chunks.zipWithIndex.map { case (jp, i) =>
          val img = decodeAviPayload(jp, fmt)
          if (img == null) VideoFrameHash(m.id, -1, -1L)
          else VideoFrameHash(m.id, i, dHashOf(img))
        }
      }
    }
  }

  def videoFrameHashes(ds: Dataset[MediaRow]): Dataset[VideoFrameHash] =
    ds.mapPartitions(_.grouped(BatchSize).flatMap(videoFrameHashesBatch))

  /** Perceptual video near-dup groups: a video's fingerprint is its SET
    * of frame dHashes (sorted distinct — frame order, repetition and
    * container packaging drop out, so padded / re-encoded / frame-looped
    * variants group together); groups key on that signature with a
    * min-id keeper — the video face of [[dHashGroups]]. Videos with ANY
    * undecodable frame (`frameIdx = -1` sentinel) are quarantined out,
    * not just fully-undecodable ones: a partially-corrupt variant's
    * subset signature must not group it with clean videos. Scale shape:
    * the codec work is one batched `mapPartitions` pass; the only
    * shuffles are the per-video set aggregation (where the sentinel
    * check rides along as a max) and the group-by on the tiny signature
    * (≤ 8 bytes per distinct frame class).
    */
  def videoFingerprintGroups(ds: Dataset[MediaRow])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    videoFrameHashes(ds).toDF()
      .groupBy("id").agg(
        // collect_set skips nulls, so sentinel rows contribute no hash
        sort_array(collect_set(when(col("frameIdx") >= 0, col("dhash"))))
          .as("sig"),
        max((col("frameIdx") < 0).cast("int")).as("corrupt"))
      .filter(col("corrupt") === 0) // quarantine key, not the hash value
      .groupBy("sig")
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("keeper"))
  }

  /** deterministic MJPEG-AVI: `1 + id % 5` solid-gray JPEG frames of
    * formula-derived size; gray levels sit at 16-bucket centers
    * (8 + 16k) so the decoded mean-luma bucket is a pure id/frame
    * formula despite JPEG lossiness
    */
  def syntheticAviMjpeg(id: Long): Array[Byte] = {
    headless()
    val w = 64 + (id % 4).toInt * 16
    val h = 48 + (id % 3).toInt * 16
    val frames = 1 + (id % 5).toInt
    def u32le(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
      cc.getBytes("ISO-8859-1") ++ u32le(body.length.toLong) ++ padded
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("ISO-8859-1") ++ body)
    val jpegs = (0 until frames).map { f =>
      val v = 8 + 16 * (((id * 7 + f * 3) % 16).toInt)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = img.createGraphics()
      g2.setColor(new java.awt.Color(v, v, v))
      g2.fillRect(0, 0, w, h)
      g2.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // minimal-but-wellformed headers: avih (56 bytes) + one video
    // stream header pair; the frame data lives in the movi list
    val avih = chunk("avih",
      u32le(33333) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++
        u32le(frames.toLong) ++ u32le(0) ++ u32le(1) ++ u32le(0) ++
        u32le(w.toLong) ++ u32le(h.toLong) ++ Array.fill[Byte](16)(0))
    val strh = chunk("strh",
      "vids".getBytes("ISO-8859-1") ++ "MJPG".getBytes("ISO-8859-1") ++
        Array.fill[Byte](12)(0) ++ u32le(1) ++ u32le(30) ++ u32le(0) ++
        u32le(frames.toLong) ++ Array.fill[Byte](16)(0))
    val strf = chunk("strf",
      u32le(40) ++ u32le(w.toLong) ++ u32le(h.toLong) ++
        Array((1 & 0xFF).toByte, 0.toByte, 24.toByte, 0.toByte) ++
        "MJPG".getBytes("ISO-8859-1") ++ Array.fill[Byte](20)(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ u32le(body.length.toLong) ++ body
  }

  /** Deterministic striped MJPEG-AVI: every frame carries the same
    * 9-column block pattern keyed by `id mod 4` (levels 64/192 — far
    * enough apart that JPEG noise never flips a dHash gradient sign),
    * while the CONTAINER varies with the id: frame count (1 + id mod 3),
    * resolution (72×64 or 144×64 — the "re-encoded at another size"
    * variant), and a JUNK padding chunk of id-dependent length. Same
    * visual class → same perceptual fingerprint, so grouping has a
    * pure-formula oracle: group = id mod 4.
    */
  def syntheticPatternAvi(id: Long): Array[Byte] = {
    headless()
    val scale = 1 + ((id / 4) % 2).toInt
    val w = 72 * scale
    val h = 64
    val cellW = w / 9
    val phase = (id % 4).toInt
    val frames = 1 + (id % 3).toInt
    def u32le(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
      cc.getBytes("ISO-8859-1") ++ u32le(body.length.toLong) ++ padded
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("ISO-8859-1") ++ body)
    val jpeg = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = img.createGraphics()
      var cx = 0
      while (cx < 9) {
        val v = if (((cx + phase) % 4) < 2) 64 else 192
        g2.setColor(new java.awt.Color(v, v, v))
        g2.fillRect(cx * cellW, 0, cellW, h)
        cx += 1
      }
      g2.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avih = chunk("avih",
      u32le(33333) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++
        u32le(frames.toLong) ++ u32le(0) ++ u32le(1) ++ u32le(0) ++
        u32le(w.toLong) ++ u32le(h.toLong) ++ Array.fill[Byte](16)(0))
    val strh = chunk("strh",
      "vids".getBytes("ISO-8859-1") ++ "MJPG".getBytes("ISO-8859-1") ++
        Array.fill[Byte](12)(0) ++ u32le(1) ++ u32le(30) ++ u32le(0) ++
        u32le(frames.toLong) ++ Array.fill[Byte](16)(0))
    val strf = chunk("strf",
      u32le(40) ++ u32le(w.toLong) ++ u32le(h.toLong) ++
        Array((1 & 0xFF).toByte, 0.toByte, 24.toByte, 0.toByte) ++
        "MJPG".getBytes("ISO-8859-1") ++ Array.fill[Byte](20)(0))
    val junk = chunk("JUNK", Array.fill[Byte]((8 + id % 16).toInt)(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      (0 until frames).map(_ => chunk("00dc", jpeg)).reduce(_ ++ _))
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ junk ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ u32le(body.length.toLong) ++ body
  }

  /** shared RIFF scaffolding for the raw (BI_RGB) synthetic AVIs: the
    * strf declares biCompression = 0, frames are bottom-up BGR rows
    * padded to the DIB 4-byte stride in `00db` chunks
    */
  private def rawAviContainer(w: Int, h: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    def u32le(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
      cc.getBytes("ISO-8859-1") ++ u32le(body.length.toLong) ++ padded
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("ISO-8859-1") ++ body)
    val avih = chunk("avih",
      u32le(33333) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++
        u32le(frames.length.toLong) ++ u32le(0) ++ u32le(1) ++ u32le(0) ++
        u32le(w.toLong) ++ u32le(h.toLong) ++ Array.fill[Byte](16)(0))
    val strh = chunk("strh",
      "vids".getBytes("ISO-8859-1") ++ "DIB ".getBytes("ISO-8859-1") ++
        Array.fill[Byte](12)(0) ++ u32le(1) ++ u32le(30) ++ u32le(0) ++
        u32le(frames.length.toLong) ++ Array.fill[Byte](16)(0))
    val strf = chunk("strf",
      u32le(40) ++ u32le(w.toLong) ++ u32le(h.toLong) ++
        Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++
        u32le(0) ++ // biCompression = 0: BI_RGB
        Array.fill[Byte](20)(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      frames.map(f => chunk("00db", f)).reduce(_ ++ _))
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ u32le(body.length.toLong) ++ body
  }

  /** a solid-gray raw DIB frame (BGR bottom-up, 4-byte row stride) */
  private def rawGrayFrame(w: Int, h: Int, v: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = y * stride + x * 3
        out(o) = v.toByte; out(o + 1) = v.toByte; out(o + 2) = v.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** deterministic UNCOMPRESSED (BI_RGB) AVI with the same id/frame
    * geometry and gray-level formula as [[syntheticAviMjpeg]] — the
    * second real video codec path, with no codec library at all; the
    * decoded luma bucket is the exact formula (no JPEG noise to absorb)
    */
  def syntheticAviRaw(id: Long): Array[Byte] = {
    val w = 64 + (id % 4).toInt * 16
    val h = 48 + (id % 3).toInt * 16
    val frames = (0 until 1 + (id % 5).toInt).map { f =>
      rawGrayFrame(w, h, 8 + 16 * (((id * 7 + f * 3) % 16).toInt))
    }
    rawAviContainer(w, h, frames)
  }

  /** the striped [[syntheticPatternAvi]] content class (phase = id mod
    * 4, resolution/frame-count varying with id) re-packaged as raw
    * BI_RGB — for proving the perceptual fingerprint groups the SAME
    * visual content ACROSS codecs (MJPEG vs uncompressed)
    */
  def syntheticPatternAviRaw(id: Long): Array[Byte] = {
    val scale = 1 + ((id / 4) % 2).toInt
    val w = 72 * scale
    val h = 64
    val cellW = w / 9
    val phase = (id % 4).toInt
    val stride = ((w * 3 + 3) / 4) * 4
    val frame = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (if ((((x / cellW) + phase) % 4) < 2) 64 else 192).toByte
        val o = y * stride + x * 3
        frame(o) = v; frame(o + 1) = v; frame(o + 2) = v
        x += 1
      }
      y += 1
    }
    rawAviContainer(w, h, Seq.fill(1 + (id % 3).toInt)(frame))
  }

  /** deterministic solid-color test PNG (id → color) — the fixture
    * generator specs and the rows-only driver query share
    */
  def syntheticPng(id: Long, w: Int = 8, h: Int = 6): Array[Byte] = {
    headless()
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (((id * 37) % 256).toInt << 16) |
      (((id * 91) % 256).toInt << 8) | ((id * 53) % 256).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
