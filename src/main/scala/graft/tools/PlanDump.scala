package graft.tools

import org.apache.spark.sql.{GraftSqlInternals, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.TestdataGraph
import graft.graph.PageRank
import graft.model.PageRankConfig

/** Dumps the physical plan of one Arnoldi-style step job (SpMV + join-back +
  * observe) against the memoized bench graph, to audit exchange/stage counts
  * without reverse-engineering them from listener output.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val g = TestdataGraph.linkGraph(spark, sfDir)
    println(s"edges partitions = ${g.edges.rdd.getNumPartitions}")
    graft.util.ShuffleWidth.withWidth(spark, g.edges.rdd.getNumPartitions) {
      val prep = PageRank.prepare(g, PageRankConfig())
      val base = g.vertices
        .join(g.edges.select(col("src").as("id")).distinct()
          .withColumn("nd", lit(1)), Seq("id"), "left")
        .select(col("id"), when(col("nd").isNull, 1.0).otherwise(0.0).as("dang"))
        .withColumn("v0", lit(1.0))
      val tr0 = GraftSqlInternals.truncate(base)
      tr0.handle.count()
      val frame = tr0.df
      println("=== frame (truncated) partitioning ===")
      println(frame.queryExecution.executedPlan.outputPartitioning)
      val yraw = PageRank.spmv(prep,
        frame.select(col("id"), col("v0").as("rank"))).withColumnRenamed("y", "yraw")
      val step = frame.join(yraw.hint("shuffle_hash"), Seq("id"), "left")
        .withColumn("w", lit(0.85) * coalesce(col("yraw"), lit(0.0)) + lit(0.1))
        .drop("yraw")
        .observe("dots", sum(col("v0") * col("w")), sum(col("w") * col("w")))
      println("=== one Arnoldi step plan ===")
      step.explain("formatted")
    }
    spark.stop()
  }
}
