package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.LinkGraph
import graft.model.Edge

/** Durable CSR-like edge layout (SURVEY.md §1.2): normalized edges written
  * bucketed by `pmod(hash(src), buckets)` as parquet partition directories —
  * metastore-free bucketing that survives across sessions — sorted within
  * files by (src, dst), mirroring the reference's per-row column sort
  * (/root/reference/petsc_util.cc:714-722) and block row partitioning
  * (petsc_util.cc:331-344).
  *
  * Reading back restores a src-clustered layout: a rank-vector join only
  * shuffles the vector side, and bucket pruning applies when a query
  * filters on the bucket key.
  */
object EdgeStore {

  def bucketCol(buckets: Int) = pmod(xxhash64(col("src")), lit(buckets)).cast("int")

  def write(g: LinkGraph, path: String, buckets: Int = 64): Unit = {
    g.edges.toDF()
      .withColumn("bucket", bucketCol(buckets))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("src"), col("dst"))
      .write.mode("overwrite")
      .partitionBy("bucket")
      .parquet(s"$path/edges")
    g.vertices.write.mode("overwrite").parquet(s"$path/vertices")
    g.dict.write.mode("overwrite").parquet(s"$path/dict")
  }

  def read(spark: SparkSession, path: String): LinkGraph = {
    import spark.implicits._
    val edges = spark.read.parquet(s"$path/edges")
      .select(col("src"), col("dst"), col("weight")).as[Edge]
      .persist()
    val vertices = spark.read.parquet(s"$path/vertices").persist()
    val dict = spark.read.parquet(s"$path/dict")
    LinkGraph(edges, edges, vertices, dict, vertices.count(), edges.count())
  }
}
