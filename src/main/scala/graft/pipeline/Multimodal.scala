package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Hash64

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batched per-partition passes.
  *
  * The Spark-side architecture is real and tested — schema, partition-size
  * control, per-partition batch iteration (the Scala analogue of
  * `mapInPandas` batch processing), and metadata propagation. The codec
  * calls themselves are STUBS: no image/audio library ships in this
  * container, so `decodeStub` derives deterministic fake features from the
  * bytes. Swap `decodeStub` for a real decoder (e.g. javacv / TwelveMonkeys)
  * without touching any of the distributed plumbing.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],  // opaque encoded bytes
      width: Int, height: Int, sample_rate: Int, duration_ms: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String,
      feat_dim: Int, features: Array[Float],
      frames_sampled: Int, ok: Boolean)

  /** Deterministic synthetic media table (payload bytes are a pure function
    * of media_id), used where real binaries would be scanned from parquet.
    */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int = 0): Dataset[MediaRow] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, p).map { id =>
      val kind = Seq("image", "audio", "video")(Hash64.mod(Hash64.h(7L, id, 1L), 3L).toInt)
      val len = 64 + Hash64.mod(Hash64.h(7L, id, 2L), 192L).toInt
      val bytes = Array.tabulate[Byte](len)(i => Hash64.h(7L, id, i.toLong).toByte)
      MediaRow(id, kind, bytes,
        width = 16 + Hash64.mod(Hash64.h(7L, id, 3L), 1024L).toInt,
        height = 16 + Hash64.mod(Hash64.h(7L, id, 4L), 1024L).toInt,
        sample_rate = 16000, duration_ms = 1000 + Hash64.mod(Hash64.h(7L, id, 5L), 60000L).toInt)
    }
  }

  /** STUB decoder: real implementation would decode `payload` with a codec
    * library. The fake is deterministic in the payload bytes so tests are
    * exact. Feature dim: 8 per sampled frame.
    */
  private def decodeStub(row: MediaRow, frameCount: Int): MediaFeatures = {
    val frames = row.kind match {
      case "image" => 1
      case "audio" => math.max(1, row.duration_ms / 10000)
      case _       => frameCount
    }
    val feats = Array.tabulate(frames * 8) { i =>
      val b = row.payload(i % row.payload.length)
      (Hash64.h(11L, row.media_id, i.toLong, b.toLong) % 1000L).toFloat / 1000.0f
    }
    MediaFeatures(row.media_id, row.kind, feats.length, feats,
      frames_sampled = frames, ok = row.payload.nonEmpty)
  }

  /** Batched per-partition feature extraction — the mapInPandas-shaped pass:
    * rows stream through in `batchSize` chunks (bounding peak memory when a
    * real decoder holds decoded frames), one task per partition, no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRow], frameCount: Int = 4,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would allocate one codec context per batch here
        batch.iterator.map(r => decodeStub(r, frameCount))
      }
    }
  }

  /** Resize metadata transform (pure column math — no decode needed):
    * target box fit preserving aspect ratio.
    */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(maxSide) / col("width"), lit(maxSide) / col("height"), lit(1.0))
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
