package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing probe against a testdata sf dir.
  * sbt "runMain graft.tools.QueryProbe <sfDir> <threads> <query> [query…]"
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val threads = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", sys.env.getOrElse("GRAFT_LOCAL_DIR", "/tmp"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    spark.stop()
  }
}
