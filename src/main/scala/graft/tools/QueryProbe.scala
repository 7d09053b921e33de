package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Repeated-timing probe for ONE bench query — the per-operator rehearsal
  * loop (Bench times the whole block; this isolates one operator's cost and
  * its stage breakdown so a slow query can be located, not guessed at).
  *
  * sbt "runMain graft.tools.QueryProbe <query_name> [reps]"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      GRAFT_PROBE_STAGES=1 to print per-stage wall totals of the last rep.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000") // match Bench
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stageAgg = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val jobAgg = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    // read by the listener-bus thread — needs a happens-before edge or the
    // dispatch thread may never observe the main thread's write
    val listen = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = if (listen.get) {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val key = si.name.split(" at ").lastOption.getOrElse(si.name)
        stageAgg.merge(key, (wall, 1L), (a, b) => (a._1 + b._1, a._2 + b._2))
      }
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = if (listen.get) {
        val key = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .map(_.split(" at ").lastOption.getOrElse("?")).getOrElse("?")
        jobAgg.merge(key, 1L, (a: Long, b: Long) => a + b)
      }
    })

    SparkEntry.benchSetup(spark, sfDir)
    val fn = SparkEntry.benchOverrides.getOrElse(name, SparkEntry.queries(name))
    val times = (1 to reps).map { i =>
      if (i == reps && sys.env.get("GRAFT_PROBE_STAGES").contains("1")) listen.set(true)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name rep $i: $sec%.3f s")
      sec
    }
    println(f"[probe] $name best=${times.min}%.3f s median=${times.sorted.apply(reps / 2)}%.3f s")
    if (sys.env.get("GRAFT_PROBE_STAGES").contains("1")) {
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      println("[probe] stage wall totals of last rep (ms, count):")
      stageAgg.asScala.toSeq.sortBy(-_._2._1).take(15).foreach { case (k, (w, c)) =>
        println(f"  $w%6d ms x$c%-3d $k")
      }
      println("[probe] job counts of last rep:")
      jobAgg.asScala.toSeq.sortBy(-_._2).take(15).foreach { case (k, c) =>
        println(f"  x$c%-4d $k")
      }
    }
    spark.stop()
  }
}
