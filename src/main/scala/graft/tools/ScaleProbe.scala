package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.{GraphOps, PageRank}
import graft.ingest.TranscriptGen
import graft.model.PageRankConfig

/** Standalone fixed-work scaling sample for A/B across builds: replicates
  * Bench's scaleSample (fresh session at `threads`, graph read from a
  * durable EdgeStore, tol=0 fixed-iteration PageRank, best/median
  * steady-state iteration). Exists so two checkouts can be probed
  * back-to-back under the same VM weather — the full Bench is too coarse
  * to separate "this build is slower" from "the box is slower today".
  *
  * sbt "runMain graft.tools.ScaleProbe <storeDir> <threads> [reps] [iters] [nConv]"
  * Builds the store at storeDir if absent (deterministic TranscriptGen).
  */
object ScaleProbe {
  private def session(threads: Int): SparkSession = {
    // GRAFT_PROBE_WIDTH overrides the shuffle width (default = threads) —
    // for measuring tasks-per-core > 1 (straggler smoothing) at one level
    val width = sys.env.get("GRAFT_PROBE_WIDTH").map(_.toInt).getOrElse(threads)
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-scaleprobe-$threads")
      .config("spark.sql.shuffle.partitions", width.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val store = args(0)
    val threads = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 2
    val iters = if (args.length > 3) args(3).toInt else 12
    // default matches Bench's GRAFT_BENCH_SCALE_NCONV so A/B probes
    // replicate the gate's configuration (the probe size changes the
    // serial-floor/efficiency arithmetic — see Bench.scala)
    val nConv = if (args.length > 4) args(4).toLong else 10000000L

    if (!new java.io.File(store + "/vertices").exists()) {
      val s = session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      val turns = TranscriptGen.generate(s, nConv)
      val g = GraphOps.fromTranscripts(turns, denseIds = false)
      graft.ingest.EdgeStore.write(g, store, buckets = 64)
      s.stop()
      println(s"[scaleprobe] built store at $store")
    }

    for (r <- 1 to reps) {
      val s = session(threads)
      val g = graft.ingest.EdgeStore.read(s, store)
      val (_, stats) = PageRank.run(g, PageRankConfig(tol = 0.0, maxIter = iters))
      val walls = stats.trace.map(_.wall_ms)
      val steady = (if (walls.size > 4) walls.drop(2) else walls).sorted
      val best = steady.head / 1000.0
      val med = steady(steady.size / 2) / 1000.0
      println(f"[scaleprobe] threads=$threads rep=$r best=$best%.3f median=$med%.3f " +
        f"edges=${g.numEdges} eps_best=${g.numEdges / best}%.0f")
      s.stop()
    }
  }
}
