package graft.tools

import org.apache.spark.sql.SparkSession

import graft.TestdataGraph
import graft.graph.{ArnoldiPageRank, InOutPageRank}

/** Poor-man's sampling profiler for the DRIVER thread during an a3/a4 solve:
  * samples the main thread's stack every few ms and aggregates the deepest
  * "interesting" frame — locates where the inter-stage driver time goes
  * (optimizer, physical planning, codegen source generation, scheduling).
  */
object DriverSample {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("a4")
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
    val g = TestdataGraph.linkGraph(spark, sfDir)
    // warmup (codegen caches hot)
    if (which == "a4") ArnoldiPageRank.run(g, ArnoldiPageRank.ArnoldiConfig(tol = 1e-7))
    else InOutPageRank.run(g, InOutPageRank.InOutConfig(tol = 1e-7))

    val main = Thread.currentThread()
    val agg = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var go = true
    val sampler = new Thread(() => {
      while (go) {
        val st = main.getStackTrace
        // classify by the first recognizable subsystem frame
        val frame = st.collectFirst {
          case f if f.getClassName.contains("optimizer") &&
            !f.getClassName.contains("RuleExecutor") &&
            f.getMethodName == "apply" =>
            "rule:" + f.getClassName.split("\\.").last.split("\\$").head
          case f if f.getClassName.contains("janino") => "janino-compile"
          case f if f.getClassName.contains("CodeGenerator") ||
            f.getClassName.contains("doGenCode") ||
            f.getClassName.contains("WholeStageCodegen") => "codegen-source"
          case f if f.getClassName.contains("Optimizer") ||
            f.getClassName.contains("RuleExecutor") => "optimizer"
          case f if f.getClassName.contains("QueryPlanner") ||
            f.getClassName.contains("SparkStrateg") ||
            f.getClassName.contains("EnsureRequirements") => "physical-planning"
          case f if f.getClassName.contains("CheckAnalysis") ||
            f.getClassName.contains("Analyzer") => "analysis"
          case f if f.getMethodName == "awaitResult" ||
            f.getMethodName == "runJob" => "await-job"
          case f if f.getClassName.contains("Dataset") ||
            f.getClassName.contains("QueryExecution") => "queryexec-other"
        }.getOrElse(st.headOption.map(f =>
          f.getClassName.split("\\.").last + "." + f.getMethodName).getOrElse("?"))
        agg.merge(frame, 1, (a: Integer, b: Integer) => a + b)
        Thread.sleep(2)
      }
    })
    sampler.setDaemon(true)
    val t0 = System.nanoTime()
    sampler.start()
    if (which == "a4") ArnoldiPageRank.run(g, ArnoldiPageRank.ArnoldiConfig(tol = 1e-7))
    else InOutPageRank.run(g, InOutPageRank.InOutConfig(tol = 1e-7))
    go = false
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[ds] $which solve: $sec%.3f s, samples by driver activity:")
    import scala.jdk.CollectionConverters._
    agg.asScala.toSeq.sortBy(-_._2).take(20).foreach { case (k, v) =>
      println(f"[ds]  $v%5d  $k")
    }
    spark.stop()
  }
}
