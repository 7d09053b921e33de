package graft

import org.apache.spark.sql.SparkSession

import graft.graph._
import graft.ingest.TranscriptGen
import graft.model.PageRankConfig

/** Flagship end-to-end pipeline, runnable standalone:
  *   sbt "runMain graft.Demo [nConv] [alpha]"
  * transcripts → link graph → PageRank (+CC, LP, triangles) → stdout report.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val nConv = args.headOption.map(_.toLong).getOrElse(2000L)
    val alpha = args.lift(1).map(_.toDouble).getOrElse(0.85)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[8]"))
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val turns = TranscriptGen.generate(spark, nConv)
    val g = GraphOps.fromTranscripts(turns)
    println(s"graph: ${g.numVertices} vertices, ${g.numEdges} edges")
    GraphOps.matrixStats(g).show()

    val (ranks, stats) = PageRank.run(g,
      PageRankConfig(alpha = alpha, tol = 1e-6, saltThreshold = 256))
    println(s"pagerank: ${stats.iterations} iterations, residual ${stats.residual}, " +
      s"converged=${stats.reason.converged}")
    stats.trace.takeRight(3).foreach(m =>
      println(f"  iter ${m.iter}%4d  residual ${m.residual}%10.3e  ${m.wall_ms} ms"))
    println("top-10 by rank:")
    ranks.orderBy(org.apache.spark.sql.functions.desc("rank")).limit(10)
      .join(g.dict, "id")
      .orderBy(org.apache.spark.sql.functions.desc("rank"))
      .show(10, truncate = false)

    val cc = ConnectedComponents.run(g.edges, g.vertices)
    println(s"components: ${cc.select("component").distinct().count()}")
    val lp = LabelPropagation.run(g.edges, g.vertices, rounds = 4)
    println(s"labels after 4 rounds: ${lp.select("label").distinct().count()}")
    println(s"triangles: ${Triangles.count(g.edges)}")
    spark.stop()
  }
}
