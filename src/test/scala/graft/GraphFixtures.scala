package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.graph.{GraphOps, LinkGraph}

/** FIXTURES.md §3 canonical golden graphs. */
object GraphFixtures {
  // G1 line + dangle: vertex 5 has no out-edges
  val g1: (Int, Seq[(Int, Int, Double)]) =
    (6, Seq((0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 0, 1.0), (0, 5, 1.0)))
  // G2 star hub: i→0 for i=1..8, 0→1
  val g2: (Int, Seq[(Int, Int, Double)]) =
    (9, (1 to 8).map(i => (i, 0, 1.0)) :+ ((0, 1, 1.0)))
  // G3 two components: {0,1,2} cycle + {3,4} pair
  val g3: (Int, Seq[(Int, Int, Double)]) =
    (5, Seq((0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (3, 4, 1.0)))
  // G4 K4 + pendant: triangles = 4
  val g4: (Int, Seq[(Int, Int, Double)]) = {
    val k4 = for (a <- 0 until 4; b <- 0 until 4 if a < b) yield (a, b, 1.0)
    (5, k4 :+ ((3, 4, 1.0)))
  }
  // G5 self-loop + duplicated multi-edge
  val g5: (Int, Seq[(Int, Int, Double)]) =
    (2, Seq((0, 0, 1.0), (0, 1, 1.0), (0, 1, 1.0)))

  val all: Map[String, (Int, Seq[(Int, Int, Double)])] =
    Map("g1" -> g1, "g2" -> g2, "g3" -> g3, "g4" -> g4, "g5" -> g5)

  /** Build a LinkGraph from a raw edge list (duplicates collapse to
    * multiplicity weights, matching GraphOps.fromTranscripts semantics).
    */
  def linkGraph(spark: SparkSession, n: Int, edges: Seq[(Int, Int, Double)]): LinkGraph = {
    import spark.implicits._
    val raw = edges.toDF("src", "dst", "w")
      .groupBy(col("src"), col("dst"))
      .agg(org.apache.spark.sql.functions.sum(col("w")).as("weight"))
    val verts = (0 until n).map(_.toLong).toDF("id")
    val dict = (0 until n).map(i => (s"v$i", i.toLong)).toDF("conv_id", "id")
    GraphOps.normalizeFrom(raw, verts, dict)
  }
}
