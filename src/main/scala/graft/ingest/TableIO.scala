package graft.ingest

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
