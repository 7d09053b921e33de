package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphOps, PageRank}
import graft.ingest.{EdgeStore, TranscriptGen}
import graft.model.PageRankConfig

class EdgeStoreSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed round-trip preserves the graph and PageRank results") {
    val g = GraphOps.fromTranscripts(TranscriptGen.generate(spark, 300))
    val dir = java.nio.file.Files.createTempDirectory("graft-edges").toString
    EdgeStore.write(g, dir, buckets = 8)
    val g2 = EdgeStore.read(spark, dir)
    assert(g2.numVertices == g.numVertices && g2.numEdges == g.numEdges)
    // identical normalized edge multiset
    val a = g.edges.collect().map(e => (e.src, e.dst, e.weight)).toSet
    val b = g2.edges.collect().map(e => (e.src, e.dst, e.weight)).toSet
    assert(a == b)
    // PageRank from the durable layout matches in-memory exactly
    val cfg = PageRankConfig(alpha = 0.85, tol = 0.0, maxIter = 8)
    val r1 = PageRank.run(g, cfg)._1.collect().map(r => r.id -> r.rank).toMap
    val r2 = PageRank.run(g2, cfg)._1.collect().map(r => r.id -> r.rank).toMap
    r1.foreach { case (id, v) => assert(math.abs(r2(id) - v) < 1e-12) }
    // partition pruning: tbl + bucket filters prune partition directories of
    // the combined tree
    val pruned = spark.read.parquet(s"$dir/data")
      .where(col("tbl") === "norm" && col("bucket") === 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(plan.contains("PartitionFilters: [isnotnull(tbl") ||
      plan.contains("PartitionFilters: [isnotnull(bucket"), plan)
    // raw (pre-normalization) multiplicities survive the round trip
    val ra = g.rawEdges.collect().map(e => (e.src, e.dst, e.weight)).toSet
    val rb = g2.rawEdges.collect().map(e => (e.src, e.dst, e.weight)).toSet
    assert(ra == rb)
  }

  test("rank join over a re-read store shuffles only the vector side") {
    val g = GraphOps.fromTranscripts(TranscriptGen.generate(spark, 300))
    val dir = java.nio.file.Files.createTempDirectory("graft-edges2").toString
    EdgeStore.write(g, dir, buckets = 8)
    val g2 = EdgeStore.read(spark, dir)
    g2.edges.count() // materialize the cache
    val prep = PageRank.prepare(g2, PageRankConfig())
    val x = g2.vertices.withColumn("rank", lit(1.0 / g2.numVertices))
    val spmv = PageRank.spmv(prep, x)
    spmv.count() // finalize AQE plan
    val p = spmv.queryExecution.executedPlan.toString
    // the edge side must flow from the cached, already-src-partitioned scan
    // straight into the join: a re-shuffle would show up as an
    // ENSURE_REQUIREMENTS exchange on src (the cache-build REPARTITION_BY_COL
    // inside InMemoryRelation is the one-time read cost, not per-join)
    assert(p.contains("InMemoryTableScan"), s"edge cache not used:\n$p")
    assert(p.contains("ShuffledHashJoin"), s"expected ShuffledHashJoin:\n$p")
    val edgeReshuffle =
      """Exchange hashpartitioning\(src#\d+L?, \d+\), ENSURE_REQUIREMENTS""".r
    assert(edgeReshuffle.findFirstIn(p).isEmpty,
      s"edge side re-shuffled despite durable store:\n$p")
  }
}
