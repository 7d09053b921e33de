package graft.tools

import org.apache.spark.sql.SparkSession

import graft.TestdataGraph
import graft.graph.{ArnoldiPageRank, InOutPageRank}

/** Convergence-depth probe for the inout/arnoldi solvers on a testdata dir.
  * sbt "runMain graft.tools.SolverProbe <sfDir>"
  */
object SolverProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = TestdataGraph.linkGraph(spark, sfDir)
    var t0 = System.nanoTime()
    val (_, s1) = InOutPageRank.run(g, InOutPageRank.InOutConfig(
      alpha = 0.85, tol = 1e-13, maxIter = 600))
    println(f"inout:   iters=${s1.iterations} residual=${s1.residual}%.3e " +
      f"converged=${s1.reason.converged} ${(System.nanoTime() - t0) / 1e9}%.1fs")
    t0 = System.nanoTime()
    val (_, s2) = ArnoldiPageRank.run(g, ArnoldiPageRank.ArnoldiConfig(
      alpha = 0.85, tol = 1e-12, k = 8, maxRestarts = 100))
    println(f"arnoldi: restarts=${s2.iterations} residual=${s2.residual}%.3e " +
      f"converged=${s2.reason.converged} ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
