package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Reproduces Bench's per-query block (same session shape, same pass
  * structure) with PER-PASS per-query timings plus Janino compilation
  * counters, to locate pass-over-pass cost that the block context induces
  * but a single-query probe (QueryProbe) cannot see — e.g. codegen-cache
  * eviction between passes across the 34-query block.
  *
  * sbt "runMain graft.tools.BlockProbe [passes] [only,csv,names]"
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, GRAFT_CODEGEN_CACHE (default
  * 2000, matching Bench).
  */
object BlockProbe {
  def main(args: Array[String]): Unit = {
    val passes = if (args.length > 0) args(0).toInt else 3
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").toSet else Set.empty
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("GRAFT_CODEGEN_CACHE", "2000"))
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val compile = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    SparkEntry.benchSetup(spark, sfDir)
    val qNames = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    for (p <- 1 to passes) {
      for (name <- qNames) {
        val fn = SparkEntry.benchOverrides
          .getOrElse(name, SparkEntry.queries(name))
        val c0 = compile.getCount
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val compiles = compile.getCount - c0
        println(f"[block] pass $p $name%-22s $sec%7.3f s  janinoCompiles=$compiles")
      }
    }
    spark.stop()
  }
}
