package graft.ingest

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thin table-IO layer (SURVEY.md §7). Production target is Iceberg
  * (`df.writeTo(table).append()` / `spark.read.table`); no Iceberg runtime
  * jar ships in this sandbox, so the in-sandbox implementation writes the
  * same schemas as Parquet directories and provides the two properties the
  * north rule actually depends on:
  *
  *  - **atomic snapshot commit**: write to `<dir>/.tmp_<name>`, then a single
  *    filesystem rename to `<dir>/<name>` — readers never observe a partial
  *    snapshot (≙ an Iceberg snapshot commit);
  *  - **snapshot listing/latest** for resume-from-checkpoint.
  */
object TableIO {

  private def fs(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new URI(path), spark.sparkContext.hadoopConfiguration)

  /** Atomically publish `df` as `<dir>/<name>` (parquet). */
  def commitSnapshot(df: DataFrame, dir: String, name: String): String = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val tmp = new Path(s"$dir/.tmp_$name")
    val dst = new Path(s"$dir/$name")
    f.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    f.delete(dst, true)
    require(f.rename(tmp, dst), s"atomic rename failed: $tmp -> $dst")
    dst.toString
  }

  /** Committed snapshots under `dir` matching `prefix`, by numeric suffix. */
  def snapshots(spark: SparkSession, dir: String, prefix: String): Seq[(Int, String)] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) return Nil
    f.listStatus(p).toSeq
      .map(_.getPath)
      .filter(x => x.getName.startsWith(prefix) && !x.getName.startsWith("."))
      .flatMap { x =>
        x.getName.stripPrefix(prefix).toIntOption.map(i => (i, x.toString))
      }
      .sortBy(_._1)
  }

  def latestSnapshot(spark: SparkSession, dir: String, prefix: String): Option[(Int, String)] =
    snapshots(spark, dir, prefix).lastOption

  /** Append rows to a growing parquet table (metrics / lineage sidecars). */
  def appendRows(df: DataFrame, dir: String): Unit =
    df.write.mode("append").parquet(dir)

  /** Small sidecar marker files (format/version notes next to snapshots). */
  def writeMarker(spark: SparkSession, path: String, body: String): Unit = {
    val out = fs(spark, path).create(new Path(path), true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readMarker(spark: SparkSession, path: String): Option[String] = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  // ---- per-partition lineage (north rule: "every iteration checkpointed …
  // alongside per-partition lineage and residual metrics") ----

  /** Per-partition lineage of a committed snapshot: one row per non-empty
    * partition with its row count and an order-independent content digest
    * (bit_xor fold of xxhash64 over all columns). Because xor is associative
    * and commutative, the fold of the per-partition digests equals the
    * whole-table digest under ANY partitioning — so resume can validate a
    * snapshot even when a different session re-splits the parquet files into
    * a different partition count.
    */
  def partitionLineage(df: DataFrame, runId: String, iter: Int): DataFrame =
    df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("row_count"),
        bit_xor(xxhash64(df.columns.map(col): _*)).as("digest"))
      .select(lit(runId).as("run_id"), lit(iter).as("iter"),
        col("partition_id"), col("row_count"), col("digest"))

  /** Commit `df` as snapshot `<dir>/<prefix><iter>` AND record its
    * per-partition lineage in the `_lineage` sidecar, computed from the
    * files actually committed (not the pre-write plan), so the digest
    * certifies the bytes a resume will read.
    */
  def commitSnapshotWithLineage(df: DataFrame, dir: String, runId: String,
      prefix: String, iter: Int): DataFrame = {
    val spark = df.sparkSession
    val path = commitSnapshot(df, dir, s"$prefix$iter")
    val committed = spark.read.parquet(path)
    appendRows(partitionLineage(committed, runId, iter), s"$dir/_lineage")
    committed
  }

  /** Latest snapshot whose content validates against its recorded lineage
    * (total row count + xor-fold of digests). Snapshots that fail validation
    * — or that have no lineage rows while a lineage table exists — are
    * distrusted and skipped, falling back to the previous one. A missing
    * `_lineage` table altogether (pre-lineage checkpoint dirs) falls back to
    * unvalidated latest-snapshot semantics.
    */
  def latestValidSnapshot(spark: SparkSession, dir: String,
      prefix: String): Option[(Int, DataFrame)] = {
    val all = snapshots(spark, dir, prefix).reverse
    if (all.isEmpty) return None
    val linPath = new Path(s"$dir/_lineage")
    if (!fs(spark, dir).exists(linPath))
      return all.headOption.map { case (k, p) => (k, spark.read.parquet(p)) }
    val lineage = spark.read.parquet(s"$dir/_lineage")
      .groupBy(col("iter"))
      .agg(sum(col("row_count")).as("rows"), bit_xor(col("digest")).as("digest"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    all.view.flatMap { case (k, p) =>
      lineage.get(k).flatMap { case (expRows, expDigest) =>
        // an unreadable snapshot (partially deleted / mid-write crash) is
        // just another failed validation — fall through to the previous one
        scala.util.Try {
          val df = spark.read.parquet(p)
          val got = df.agg(count(lit(1)), bit_xor(xxhash64(df.columns.map(col): _*))).head()
          val rows = got.getLong(0)
          val digest = if (rows == 0) 0L else got.getLong(1)
          if (rows == expRows && (rows == 0 || digest == expDigest)) Some((k, df))
          else None
        }.toOption.flatten
      }
    }.headOption
  }
}
