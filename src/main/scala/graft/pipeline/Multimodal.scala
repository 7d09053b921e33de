package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Hash64

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batched per-partition passes.
  *
  * The image and audio paths are REAL decoders built on codecs that ship
  * inside the JDK — `javax.imageio.ImageIO` (PNG) and
  * `javax.sound.sampled.AudioSystem` (WAV/PCM): `syntheticMedia` emits
  * genuine encoded payloads, and `extractFeatures` parses those bytes back
  * (dimensions, pixel statistics, sample counts, amplitude statistics).
  * Only the video kind is a stub — no video codec ships in the JDK; swap
  * `videoStub` for a real decoder (javacv et al.) without touching the
  * distributed plumbing (schema, partition-size control, per-partition
  * batched iteration — the Scala analogue of `mapInPandas` batch
  * processing).
  *
  * The synthetic content is a simple closed-form function of `media_id`
  * (solid-color images, constant-amplitude PCM), so every decoded statistic
  * is reproducible by an independent engine from the id alone — which is
  * what lets the driver's DuckDB oracle verify that the decode actually ran.
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

  /** Deterministic synthetic media table (payload bytes are a pure function
    * of media_id): real PNG and WAV payloads for the image/audio kinds,
    * opaque bytes for video.
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
          val len = 64 + Hash64.mod(Hash64.h(7L, id, 2L), 192L).toInt
          val bytes = Array.tabulate[Byte](len)(i => Hash64.h(7L, id, i.toLong).toByte)
          MediaRow(id, "video", bytes,
            width = 16 + Hash64.mod(Hash64.h(7L, id, 3L), 1024L).toInt,
            height = 16 + Hash64.mod(Hash64.h(7L, id, 4L), 1024L).toInt,
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

  /** STUB for the video kind — no video codec ships in this container's
    * JDK. Deterministic in the payload bytes so tests are exact; swap for a
    * real frame decoder without touching the plumbing. 8 features per
    * sampled frame.
    */
  private def videoStub(row: MediaRow, frameCount: Int): MediaFeatures = {
    val feats = Array.tabulate(frameCount * 8) { i =>
      val b = row.payload(i % row.payload.length)
      (Hash64.h(11L, row.media_id, i.toLong, b.toLong) % 1000L).toFloat / 1000.0f
    }
    MediaFeatures(row.media_id, row.kind, feats.length, feats,
      frames_sampled = frameCount, ok = row.payload.nonEmpty)
  }

  private def decode(row: MediaRow, frameCount: Int): MediaFeatures =
    row.kind match {
      case "image" => decodeImage(row)
      case "audio" => decodeAudio(row)
      case _       => videoStub(row, frameCount)
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
