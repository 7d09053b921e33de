package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batched per-partition passes.
  *
  * All three kinds are REAL decoders: `javax.imageio.ImageIO` (PNG) and
  * `javax.sound.sampled.AudioSystem` (WAV/PCM) from the JDK, plus a
  * hand-rolled uncompressed RIFF/AVI parser (DIB BGR24 frames) for video —
  * the JDK ships no video codec, but an uncompressed AVI is pure byte-format
  * work, exactly like the WAV path. `syntheticMedia` emits genuine encoded
  * payloads and `extractFeatures` parses those bytes back (dimensions,
  * pixel statistics, sample counts, amplitude statistics, per-frame means).
  * A heavier codec (javacv et al.) can replace any `decode*` without
  * touching the distributed plumbing (schema, partition-size control,
  * per-partition batched iteration — the Scala analogue of `mapInPandas`
  * batch processing).
  *
  * The synthetic content is a simple closed-form function of `media_id`
  * (solid-color images/frames, constant-amplitude PCM), so every decoded
  * statistic is reproducible by an independent engine from the id alone —
  * which is what lets the driver's DuckDB oracle verify that the decode
  * actually ran.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],  // opaque encoded bytes (real PNG / WAV for image/audio)
      width: Int, height: Int, sample_rate: Int, duration_ms: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String,
      feat_dim: Int, features: Array[Float],
      frames_sampled: Int, ok: Boolean)

  // closed-form synthetic parameters (shared by the generator, the decoder
  // tests, and the DuckDB oracle — keep in sync with OracleSql.mediaFeatures)
  private[pipeline] def imgW(id: Long): Int = 8 + (id % 9).toInt
  private[pipeline] def imgH(id: Long): Int = 8 + (id % 7).toInt
  private[pipeline] def imgRgb(id: Long): (Int, Int, Int) =
    (((id * 7) % 256).toInt, ((id * 13) % 256).toInt, ((id * 29) % 256).toInt)
  private[pipeline] val AudioRate = 8000
  private[pipeline] def audioSamples(id: Long): Int = 800 + (id % 5).toInt * 160
  private[pipeline] def audioAmp(id: Long): Int = 1000 + (id % 100).toInt * 10
  private[pipeline] def videoDurationMs(id: Long): Int = 1000 + (id % 59).toInt * 1000
  private[pipeline] def vidW(id: Long): Int = 8 + (id % 5).toInt
  private[pipeline] def vidH(id: Long): Int = 6 + (id % 3).toInt
  private[pipeline] def vidFrames(id: Long): Int = 2 + (id % 4).toInt
  private[pipeline] def vidRgb(id: Long, f: Int): (Int, Int, Int) =
    (((id * 7 + f * 31) % 256).toInt, ((id * 13 + f * 17) % 256).toInt,
      ((id * 29 + f * 11) % 256).toInt)

  private def encodePng(id: Long): Array[Byte] = {
    val (r, g, b) = imgRgb(id)
    val img = new java.awt.image.BufferedImage(
      imgW(id), imgH(id), java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def encodeWav(id: Long): Array[Byte] = {
    val n = audioSamples(id)
    val amp = audioAmp(id)
    val pcm = new Array[Byte](n * 2) // 16-bit mono little-endian
    var i = 0
    while (i < n) {
      pcm(2 * i) = (amp & 0xff).toByte
      pcm(2 * i + 1) = ((amp >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(AudioRate.toFloat, 16, 1,
      true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // ---- uncompressed RIFF/AVI (DIB frames) — the video codec ----
  // No video codec ships in the JDK, but an UNCOMPRESSED AVI is pure byte
  // format work (like the WAV path): RIFF('AVI ') → LIST(hdrl){avih,
  // LIST(strl){strh,strf=BITMAPINFOHEADER}} → LIST(movi){'00db' DIB frames}.
  // Frames are bottom-up BGR24 rows padded to 4-byte boundaries — the
  // standard DIB layout any AVI tool (ffmpeg, VLC, MediaPlayer) accepts.

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(id.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bos.write(le32(body.length))
    bos.write(body)
    if (body.length % 2 == 1) bos.write(0) // RIFF word alignment
    bos.toByteArray
  }
  private def riffList(kind: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST",
      kind.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body)

  private def encodeAvi(id: Long): Array[Byte] = {
    val w = vidW(id); val h = vidH(id); val n = vidFrames(id)
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val frameSize = rowBytes * h
    val avih = Array(100000, frameSize * 10, 0, 0, n, 0, 1, frameSize,
      w, h, 0, 0, 0, 0).flatMap(le32) // 14 × u32 = 56 bytes
    val strh =
      "vidsDIB ".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        Array(0, 0, 0, 1, 10, 0, n, frameSize, 0, 0).flatMap(le32) ++
        Array(0, 0, w, h).flatMap(le16) // 56 bytes
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      Array(0, frameSize, 0, 0, 0, 0).flatMap(le32) // BITMAPINFOHEADER
    val hdrl = riffList("hdrl", riffChunk("avih", avih) ++
      riffList("strl", riffChunk("strh", strh) ++ riffChunk("strf", strf)))
    val frames = (0 until n).toArray.flatMap { f =>
      val (r, g, b) = vidRgb(id, f)
      val row = new Array[Byte](rowBytes)
      var x = 0
      while (x < w) { // DIB stores BGR
        row(3 * x) = b.toByte; row(3 * x + 1) = g.toByte; row(3 * x + 2) = r.toByte
        x += 1
      }
      riffChunk("00db", Array.fill(h)(row).flatten)
    }
    val body = "AVI ".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      hdrl ++ riffList("movi", frames)
    "RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      le32(body.length) ++ body
  }

  /** Deterministic synthetic media table (payload bytes are a pure function
    * of media_id): real PNG, WAV and uncompressed-AVI payloads.
    */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int = 0): Dataset[MediaRow] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, p).map { id =>
      (id % 3) match {
        case 0 =>
          MediaRow(id, "image", encodePng(id), imgW(id), imgH(id), 0, 0)
        case 1 =>
          val n = audioSamples(id)
          MediaRow(id, "audio", encodeWav(id), 0, 0, AudioRate,
            duration_ms = n * 1000 / AudioRate)
        case _ =>
          MediaRow(id, "video", encodeAvi(id), vidW(id), vidH(id),
            sample_rate = 0, duration_ms = videoDurationMs(id))
      }
    }
  }

  /** Decode one image payload: dimensions + per-channel pixel means.
    * Features: [width, height, meanR/255, meanG/255, meanB/255].
    */
  private def decodeImage(row: MediaRow): MediaFeatures = {
    // ImageIO returns null for unrecognized bytes but THROWS on recognized-
    // but-truncated streams — both are just a bad row, not a task failure
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(row.payload))
      catch { case _: java.io.IOException => null }
    if (img == null)
      MediaFeatures(row.media_id, row.kind, 0, Array.empty, 0, ok = false)
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      val npx = (w * h).toFloat
      val feats = Array(w.toFloat, h.toFloat,
        sr / npx / 255.0f, sg / npx / 255.0f, sb / npx / 255.0f)
      MediaFeatures(row.media_id, row.kind, feats.length, feats, 1, ok = true)
    }
  }

  /** Decode one audio payload (WAV/PCM 16-bit): sample count + amplitude
    * statistics. Features: [sampleRate, nSamples, meanAbs/32767].
    * Undecodable or empty payloads yield ok=false (same contract as the
    * image path) — one corrupt row must not fail the whole partition task.
    */
  private def decodeAudio(row: MediaRow): MediaFeatures = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(row.payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException =>
          return MediaFeatures(row.media_id, row.kind, 0, Array.empty, 0,
            ok = false)
      }
    try {
      val fmt = in.getFormat
      val bytes = in.readAllBytes()
      val n = bytes.length / 2
      if (n == 0)
        MediaFeatures(row.media_id, row.kind, 0, Array.empty, 0, ok = false)
      else {
        var sumAbs = 0L
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i) & 0xff
          val hi = bytes(2 * i + 1).toInt
          sumAbs += math.abs((hi << 8) | lo)
          i += 1
        }
        val feats = Array(fmt.getSampleRate, n.toFloat,
          (sumAbs.toDouble / n / 32767.0).toFloat)
        MediaFeatures(row.media_id, row.kind, feats.length, feats, 1, ok = true)
      }
    } finally in.close()
  }

  /** Decode one video payload (uncompressed RIFF/AVI with DIB BGR24
    * frames): dimensions + per-channel means of `frameCount` evenly-sampled
    * frames. Features: [width, height, then (meanR, meanG, meanB)/255 per
    * sampled frame]. Every offset is bounds-checked — a truncated or
    * non-AVI payload yields ok=false, never a task failure (same contract
    * as the image/audio decoders).
    */
  private def decodeVideo(row: MediaRow, frameCount: Int): MediaFeatures = {
    val b = row.payload
    def bad = MediaFeatures(row.media_id, row.kind, 0, Array.empty, 0, ok = false)
    def u32(off: Int): Long =
      if (off < 0 || off + 4 > b.length) -1L
      else (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    def fcc(off: Int): String =
      if (off < 0 || off + 4 > b.length) ""
      else new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (b.length < 12 || fcc(0) != "RIFF" || fcc(8) != "AVI ") return bad
    var w = 0; var h = 0; var bits = 0; var comp = -1L
    // frame (offset, declared chunk size): the size travels with the offset
    // so each SAMPLED frame can be validated against rowBytes*h — a chunk
    // shorter than one frame must yield ok=false, not silently average
    // bytes of adjacent chunks (the old check inspected only frame 0)
    val frames = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    def walk(start: Int, end: Int): Unit = {
      var off = start
      var guard = 0
      while (off + 8 <= end && guard < (1 << 16)) {
        guard += 1
        val id = fcc(off)
        val sz = u32(off + 4)
        if (sz < 0 || off + 8 + sz > end) return // truncated chunk → stop
        if (id == "LIST") walk(off + 12, off + 8 + sz.toInt)
        else if (id == "strf" && sz >= 40) {
          w = u32(off + 8 + 4).toInt
          h = u32(off + 8 + 8).toInt
          bits = (b(off + 8 + 14) & 0xff) | ((b(off + 8 + 15) & 0xff) << 8)
          comp = u32(off + 8 + 16)
        } else if (id.length == 4 &&
            (id.endsWith("db") || id.endsWith("dc"))) {
          frames += ((off + 8, sz))
        }
        off += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
      }
    }
    val riffEnd = math.min(b.length.toLong, u32(4) + 8L).toInt
    walk(12, riffEnd)
    // only the format this decoder understands: uncompressed 24-bit DIB
    if (w <= 0 || h <= 0 || bits != 24 || comp != 0L || frames.isEmpty)
      return bad
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val n = frames.length
    val sampled = math.min(frameCount, n)
    val feats = new Array[Float](2 + 3 * sampled)
    feats(0) = w.toFloat; feats(1) = h.toFloat
    val npx = (w.toLong * h).toFloat
    var i = 0
    while (i < sampled) {
      val (foff, fsz) = frames(i * n / sampled) // evenly spaced sample plan
      if (fsz < rowBytes.toLong * h || foff + rowBytes.toLong * h > b.length)
        return bad
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = foff + y * rowBytes + 3 * x // bottom-up irrelevant for means
          sb += b(p) & 0xff; sg += b(p + 1) & 0xff; sr += b(p + 2) & 0xff
          x += 1
        }
        y += 1
      }
      feats(2 + 3 * i) = sr / npx / 255.0f
      feats(2 + 3 * i + 1) = sg / npx / 255.0f
      feats(2 + 3 * i + 2) = sb / npx / 255.0f
      i += 1
    }
    MediaFeatures(row.media_id, row.kind, feats.length, feats, sampled, ok = true)
  }

  private def decode(row: MediaRow, frameCount: Int): MediaFeatures =
    row.kind match {
      case "image" => decodeImage(row)
      case "audio" => decodeAudio(row)
      case _       => decodeVideo(row, frameCount)
    }

  /** Batched per-partition feature extraction — the mapInPandas-shaped pass:
    * rows stream through in `batchSize` chunks (bounding peak memory while
    * the decoder holds decoded frames), one task per partition, no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRow], frameCount: Int = 4,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one codec context per batch would be allocated here for decoders
        // that need one (ImageIO/AudioSystem are stateless statics)
        batch.iterator.map(r => decode(r, frameCount))
      }
    }
  }

  /** Resize metadata transform (pure column math — no decode needed):
    * target box fit preserving aspect ratio.
    */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    // audio rows carry width=0 — ANSI division throws on a zero divisor, so
    // dimension-less rows explicitly take scale 1 (no resize)
    def fit(side: Column): Column =
      when(side > 0, lit(maxSide.toDouble) / side).otherwise(lit(1.0))
    val scale = least(fit(col("width")), fit(col("height")), lit(1.0))
    media
      .withColumn("target_w", ceil(col("width") * scale).cast("int"))
      .withColumn("target_h", ceil(col("height") * scale).cast("int"))
  }

  /** Deterministic frame-sample plan for videos: `n` timestamps evenly
    * spaced in [0, duration) — pure column expression, joinable back to the
    * decode pass.
    */
  def frameSamplePlan(media: DataFrame, n: Int): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"),
        explode(transform(sequence(lit(0), lit(n - 1)),
          i => (i * col("duration_ms") / n).cast("int"))).as("frame_ts_ms"))
}
