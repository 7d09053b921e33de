package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-stage timing of the i1 incremental-merge query: store copy,
  * mergeDelta, and the scan-back, each in isolation (the bench times their
  * sum; this locates the cost).
  */
object I1Probe {
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

    graft.SparkEntry.benchSetup(spark, sfDir)
    // replicate the query body with per-phase timing
    val m = graft.SparkEntry.getClass.getDeclaredMethod(
      "i1BaseStore", classOf[SparkSession], classOf[String])
    m.setAccessible(true)
    val store = m.invoke(graft.SparkEntry, spark, sfDir).asInstanceOf[String]
    val mc = graft.SparkEntry.getClass.getDeclaredMethod(
      "i1CopyStore", classOf[SparkSession], classOf[String])
    mc.setAccessible(true)
    for (r <- 1 to reps) {
      def timed[T](label: String)(body: => T): T = {
        val t0 = System.nanoTime()
        val res = body
        println(f"[i1] rep $r $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        res
      }
      val work = timed("copy")(
        mc.invoke(graft.SparkEntry, spark, store).asInstanceOf[String])
      val delta = spark.read.parquet(s"$store/_i1_delta")
      val stats = timed("mergeDelta")(
        graft.ingest.EdgeStore.mergeDelta(spark, work, delta))
      println(s"[i1] rep $r stats: $stats")
      timed("scanNorm+count")(
        graft.ingest.EdgeStore.scanNorm(spark, work)
          .select(col("src"), col("dst"), round(col("weight"), 8).as("weight"))
          .count())
    }
    spark.stop()
  }
}
