package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.graph.LinkGraph
import graft.model.Edge

/** Durable CSR-like edge layout (SURVEY.md §1.2): normalized + raw edges
  * written bucketed by `pmod(hash(src), buckets)` as parquet partition
  * directories — metastore-free bucketing that survives across sessions —
  * sorted within files by (src, dst), mirroring the reference's per-row
  * column sort (/root/reference/petsc_util.cc:714-722) and block row
  * partitioning (petsc_util.cc:331-344).
  *
  * Plain parquet `partitionBy` directories carry NO bucketing metadata, so a
  * bare re-read would re-shuffle the edge side of every rank-vector join.
  * `read` therefore repartitions by `src` ONCE and persists: the cached
  * InMemoryRelation advertises HashPartitioning(src), so every subsequent
  * rank-join exchange lands on the vector side only (asserted by
  * EdgeStoreSpec). The directory bucketing still pays for itself on the
  * scan: bucket pruning applies to bucket-key filters, and the read's
  * repartition moves already-clustered rows.
  */
object EdgeStore {

  def bucketCol(buckets: Int) = pmod(xxhash64(col("src")), lit(buckets)).cast("int")

  def write(g: LinkGraph, path: String, buckets: Int = 64): Unit = {
    def writeEdges(ds: Dataset[Edge], sub: String): Unit =
      ds.toDF()
        .withColumn("bucket", bucketCol(buckets))
        .repartition(col("bucket"))
        .sortWithinPartitions(col("src"), col("dst"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(s"$path/$sub")
    writeEdges(g.edges, "edges")
    // raw (pre-normalization multiplicity) edges kept alongside so a
    // round-tripped graph reports the same rawEdges weights as the original
    writeEdges(g.rawEdges, "raw_edges")
    g.vertices.write.mode("overwrite").parquet(s"$path/vertices")
    g.dict.write.mode("overwrite").parquet(s"$path/dict")
  }

  def read(spark: SparkSession, path: String): LinkGraph = {
    import spark.implicits._
    val edges = spark.read.parquet(s"$path/edges")
      .select(col("src"), col("dst"), col("weight")).as[Edge]
      .repartition(col("src")) // restore co-partitioning for rank joins
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rawEdges = spark.read.parquet(s"$path/raw_edges")
      .select(col("src"), col("dst"), col("weight")).as[Edge]
    val vertices = spark.read.parquet(s"$path/vertices").persist()
    val dict = spark.read.parquet(s"$path/dict")
    LinkGraph(edges, rawEdges, vertices, dict, vertices.count(), edges.count())
  }
}
