package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Volume/stage breakdown of the d3 n-gram-Jaccard pipeline at bench scale:
  * how many inverted-index rows, posting pairs and verified candidates each
  * stage produces, and what each sub-stage costs in isolation.
  */
object D3Probe {
  def main(args: Array[String]): Unit = {
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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[d3] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    println(s"[d3] docs = ${docs.count()}")
    val d = Dedup.ngramHashSets(docs).localCheckpoint(false)
    timed("gram sets materialize")(d.count())
    println("[d3] gram rows = " + d.count())
    println("[d3] total grams = " + d.select(sum(size(col("grams")))).head())
    val inv = d.select(col("id"), explode(col("grams")).as("g"))
    timed("inv count")(println("[d3] inv rows = " + inv.count()))
    val dfc = inv.groupBy(col("g")).agg(count(lit(1)).as("df"))
    println("[d3] df histogram (top):")
    dfc.groupBy(col("df")).agg(count(lit(1)).as("n")).orderBy(desc("df"))
      .show(10, false)
    println("[d3] sum df^2 (pair join volume) = " +
      dfc.where(col("df") <= 1000).select(sum(col("df") * col("df"))).head())
    val cand = Dedup.ngramCandidates(d, 1000)
    timed("candidates")(println("[d3] cand pairs = " + cand.count()))
    val pruned = Dedup.ngramCandidatesPruned(d, 1000, 0.5)
    timed("candidatesPruned")(println("[d3] pruned cand pairs = " + pruned.count()))
    timed("full pipeline")(
      println("[d3] out rows = " + Dedup.ngramJaccardPairs(docs, threshold = 0.5).count()))
    timed("full pipeline rep2")(
      println("[d3] out rows = " + Dedup.ngramJaccardPairs(docs, threshold = 0.5).count()))
    // differential: pruned-path output must equal the unpruned verify output
    def vfy(c: org.apache.spark.sql.DataFrame) = {
      val m = Dedup.getClass.getDeclaredMethods
        .find(_.getName == "verify").get
      m.setAccessible(true)
      m.invoke(Dedup, c, d).asInstanceOf[org.apache.spark.sql.DataFrame]
        .where(col("jaccard") >= 0.5)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("j"))
    }
    val oldOut = vfy(cand)
    val newOut = vfy(pruned)
    val diff = oldOut.exceptAll(newOut).count() + newOut.exceptAll(oldOut).count()
    println(s"[d3] differential old-vs-pruned rows differing = $diff")
    spark.stop()
  }
}
