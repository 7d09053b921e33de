package graft.tools

import org.apache.spark.sql.{GraftSqlInternals, SparkSession}
import org.apache.spark.sql.functions._

import graft.TestdataGraph
import graft.graph.PageRank
import graft.model.PageRankConfig

/** Dumps the physical plan of ONE inner-outer power-phase step job as
  * restructured in round 6 (single materializing job: SpMV join + iterate
  * join + observe), for the plans/r06 evidence. Args: <outFile>
  * [<innerOutFile>] — the optional second file gets the INNER-sweep step
  * job's plan (the analytic-dᵀx single-job form: y_new in-job via a
  * stableLit dᵀx known before the job, inner+outer residuals and the next
  * dᵀ(Pᵀx) on the observe).
  */
object InOutStepDump {
  def main(args: Array[String]): Unit = {
    val outFile = args(0)
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
    graft.util.ShuffleWidth.withWidth(spark, g.edges.rdd.getNumPartitions) {
      val prep = PageRank.prepare(g, PageRankConfig())
      val srcs = g.edges.select(col("src").as("id")).distinct().withColumn("nd", lit(1))
      val base = g.vertices.join(srcs, Seq("id"), "left")
        .select(col("id"), when(col("nd").isNull, 1.0).otherwise(0.0).as("dang"))
        .withColumn("x", lit(1.0 / g.numVertices))
      val t0 = GraftSqlInternals.truncate(base)
      t0.handle.count()
      val frame = t0.df
      val vCol = lit(1.0 / g.numVertices)
      val om = GraftSqlInternals.stableLit(0.15)
      val yraw = PageRank.spmv(prep, frame.select(col("id"), col("x").as("rank")))
      val next = frame.select(col("id"), col("dang"), col("x").as("x_prev"))
        .join(yraw.hint("shuffle_hash"), Seq("id"), "left")
        .withColumn("x", lit(0.85) * coalesce(col("y"), lit(0.0)) + om * vCol)
        .observe("pw",
          sum(abs(col("x") - col("x_prev"))).as("delta"),
          sum(col("dang") * col("x")).as("dtx"),
          sum(col("x")).as("sx"))
        .select(col("id"), col("dang"), col("x"))
      val plan = next.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[dump] wrote $outFile (${plan.length} chars)")

      args.drop(1).headOption.foreach { innerOut =>
        // the inner-sweep step job (InOutPageRank inner branch, round-6
        // single-job form), with representative scalar values
        val alpha = 0.85; val beta = alpha / 2
        val st = t0.df
          .withColumn("y", col("x")) // stand-in y column of the sweep frame
          .withColumn("f", lit(alpha - beta) * col("x") + lit(1 - alpha) * vCol)
        val dtL = GraftSqlInternals.stableLit(0.01)
        val withX = st.withColumn("x", lit(beta) * col("y") + col("f")).drop("y")
        val yr2 = PageRank.spmv(prep, withX.select(col("id"), col("x").as("rank")))
        val inner = withX.join(yr2.hint("shuffle_hash"), Seq("id"), "left")
          .withColumn("yc", coalesce(col("y"), lit(0.0)))
          .withColumn("yn", col("yc") + dtL * vCol)
          .observe("in",
            sum(col("dang") * col("yc")).as("dyraw"),
            sum(abs(col("f") + lit(beta) * col("yn") - col("x"))).as("din"),
            sum(abs(col("x") - lit(alpha) * col("yn") - lit(1 - alpha) * vCol)).as("dout"))
          .select(col("id"), col("dang"), col("f"), col("x"), col("yn").as("y"))
        val p2 = inner.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(java.nio.file.Paths.get(innerOut),
          p2.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[dump] wrote $innerOut (${p2.length} chars)")
      }
    }
    spark.stop()
  }
}
