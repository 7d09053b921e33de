package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{GraphOps, PageRank}
import graft.model.PageRankConfig

/** Micro-profiler for per-iteration overhead on a tiny graph.
  * sbt "runMain graft.tools.IterProfile [aqe] [parts]"
  */
object IterProfile {
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.getOrElse("true")
    val parts = args.lift(1).getOrElse("4")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val raw = Seq((0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 0, 1.0), (0, 5, 1.0))
      .toDF("src", "dst", "weight")
    val g = GraphOps.normalizeFrom(raw, (0 until 6).map(_.toLong).toDF("id"),
      (0 until 6).map(i => (s"v$i", i.toLong)).toDF("conv_id", "id"))
    // warmup
    PageRank.run(g, PageRankConfig(alpha = 0.5, tol = 0, maxIter = 3))
    val t0 = System.nanoTime()
    val n = 30
    val (_, stats) = PageRank.run(g, PageRankConfig(alpha = 0.85, tol = 0, maxIter = n))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"aqe=$aqe parts=$parts: $n iters in $sec%.2f s = ${sec / n * 1000}%.0f ms/iter")
    spark.stop()
  }
}
