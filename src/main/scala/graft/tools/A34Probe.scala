package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

import graft.TestdataGraph
import graft.graph.{ArnoldiPageRank, InOutPageRank}

/** Bench-config structural probe for a3/a4: outer-iteration counts, Spark
  * job/stage counts per solve, per-iteration wall — locates whether the cost
  * is job count x fixed overhead or in-stage compute.
  */
object A34Probe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicLong(); val stages = new AtomicLong()
    val tasks = new AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(sc.stageInfo.numTasks)
      }
    })
    val g = TestdataGraph.linkGraph(spark, sfDir)
    println(s"[a34] graph: V=${g.numVertices} E=${g.numEdges} " +
      s"parts=${g.edges.rdd.getNumPartitions}")
    // A/B hatch: GRAFT_PROBE_WSCG=0 disables whole-stage codegen for the
    // solves below (micro-job floor experiment)
    if (sys.env.get("GRAFT_PROBE_WSCG").contains("0")) {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      println("[a34] wholeStage codegen DISABLED")
    }
    for (r <- 1 to reps) {
      var j0 = jobs.get; var s0 = stages.get; var k0 = tasks.get
      var t0 = System.nanoTime()
      val (_, st3) = InOutPageRank.run(g, InOutPageRank.InOutConfig(tol = 1e-7))
      Thread.sleep(200)
      println(f"[a34] rep $r a3: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        s"outer=${st3.iterations} jobs=${jobs.get - j0} stages=${stages.get - s0} " +
        s"tasks=${tasks.get - k0} iterWallMs=${st3.trace.map(_.wall_ms).mkString(",")}")
      j0 = jobs.get; s0 = stages.get; k0 = tasks.get
      t0 = System.nanoTime()
      val (_, st4) = ArnoldiPageRank.run(g, ArnoldiPageRank.ArnoldiConfig(tol = 1e-7))
      Thread.sleep(200)
      println(f"[a34] rep $r a4: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        s"restarts=${st4.iterations} jobs=${jobs.get - j0} stages=${stages.get - s0} " +
        s"tasks=${tasks.get - k0} iterWallMs=${st4.trace.map(_.wall_ms).mkString(",")}")
    }
    spark.stop()
  }
}
