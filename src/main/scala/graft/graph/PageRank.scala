package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ingest.TableIO
import graft.model._

/** Damped power-method PageRank, rebuilt Spark-first.
  *
  * Semantics mirror the reference power loop
  * (/root/reference/ppagerank.cc:278-337) exactly:
  *
  *   x₀ = v (uniform 1/N by default, ppagerank.cc:291-295)
  *   y  = α·Pᵀx                    — one distributed SpMV ≙ join + sum-agg
  *   ω  = 1 − ‖y‖₁                 — single scalar folding BOTH dangling and
  *                                   teleport mass (ppagerank.cc:307-315,
  *                                   683-689): dᵀx = eᵀx − eᵀPᵀx, eᵀx = 1
  *   y += ω·v
  *   δ  = ‖y − x‖₁; stop when δ < tol (ppagerank.cc:319-329)
  *
  * Each iteration is one flat DAG — scan(edges) + join(x) + agg — plus two
  * scalar aggregates (≙ the reference's one SpMV + O(1) MPI_Allreduce per
  * step). Lineage is truncated every `checkpointEvery` iterations either by
  * an atomic parquet snapshot (resumable, north rule) or localCheckpoint.
  *
  * Skew: hub sources (out-degree > saltThreshold) have their edge rows salted
  * across `saltBuckets` sub-keys and the rank vector replicated per sub-key
  * for the join — the declarative analogue of the reference's nnz-weighted
  * row redistribution (/root/reference/petsc_util.cc:1093-1263). Summation is
  * exact, so salting never changes results.
  */
object PageRank {

  final case class Prepared(
      joinEdges: DataFrame,        // (src, salt, dst, weight)
      hubs: DataFrame,             // (src) hub sources, broadcast-sized
      saltBuckets: Int,
      saltEnabled: Boolean)

  /** One-time per-graph preparation shared across runs (≙ script mode's
    * normalize-once, /root/reference/ppagerank_main.cc:408-467).
    */
  def prepare(g: LinkGraph, cfg: PageRankConfig): Prepared = {
    if (cfg.saltThreshold <= 0) {
      Prepared(g.edges.toDF(), null, 1, saltEnabled = false)
    } else {
      val s = cfg.saltBuckets
      val hubs = g.edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        .where(col("outdeg") > cfg.saltThreshold)
        .select(col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      hubs.count()
      val salted = g.edges.toDF()
        .join(broadcast(hubs.withColumn("is_hub", lit(true))), Seq("src"), "left")
        .withColumn("salt",
          when(col("is_hub").isNotNull, pmod(xxhash64(col("dst")), lit(s)).cast("int"))
            .otherwise(lit(0)))
        .select(col("src"), col("salt"), col("dst"), col("weight"))
        .repartition(col("src"), col("salt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      salted.count()
      Prepared(salted, hubs, s, saltEnabled = true)
    }
  }

  /** y_raw = Pᵀx as (id, y) — the SpMV kernel (C2):
    * equi-join of edges with the rank vector on source id, then per-dst sum.
    * ≙ MatMultTranspose at /root/reference/ppagerank.cc:301-305.
    */
  def spmv(prep: Prepared, x: DataFrame): DataFrame = {
    val joined =
      if (!prep.saltEnabled) {
        prep.joinEdges.join(x, prep.joinEdges("src") === x("id"))
      } else {
        // replicate hub rank rows across all sub-keys; `explode` cannot sit
        // inside `when`, so build the salt list per row and explode it
        val xs = x.join(broadcast(prep.hubs.withColumnRenamed("src", "id")
              .withColumn("is_hub", lit(true))), Seq("id"), "left")
          .withColumn("salts",
            when(col("is_hub").isNotNull,
              sequence(lit(0), lit(prep.saltBuckets - 1)))
            .otherwise(array(lit(0))))
          .select(col("id"), explode(col("salts")).as("salt"), col("rank"))
        prep.joinEdges.join(xs, prep.joinEdges("src") === xs("id") &&
          prep.joinEdges("salt") === xs("salt"))
      }
    joined.groupBy(col("dst").as("id"))
      .agg(sum(col("weight") * col("rank")).as("y"))
  }

  /** Run from scratch or resume from the latest committed checkpoint under
    * cfg.checkpointDir (north-rule resumability).
    */
  def run(g: LinkGraph, cfg: PageRankConfig = PageRankConfig(),
      runId: String = "pr", resume: Boolean = false,
      personalization: Option[DataFrame] = None): (Dataset[VertexRank], PageRankStats) = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val n = g.numVertices
    require(n > 0, "empty vertex domain")
    val prep = prepare(g, cfg)

    val vDf = personalization.map(_.select(col("id"), col("v").cast("double"))
      .persist(StorageLevel.MEMORY_AND_DISK))

    // x₀ = v (ppagerank.cc:291-295), or the latest checkpoint when resuming.
    var startIter = 0
    var x: DataFrame = (cfg.checkpointDir, resume) match {
      case (Some(dir), true) =>
        TableIO.latestSnapshot(spark, s"$dir/$runId", "iter_") match {
          case Some((k, path)) =>
            startIter = k
            spark.read.parquet(path).select(col("id"), col("rank"))
          case None => initialX(g, n, vDf)
        }
      case _ => initialX(g, n, vDf)
    }
    x = x.persist(StorageLevel.MEMORY_AND_DISK)

    val trace = scala.collection.mutable.ArrayBuffer[IterMetric]()
    var flushedUpTo = 0
    var iter = startIter
    var delta = Double.MaxValue
    var reason: ConvergedReason = ConvergedReason.MaxIterations

    while (iter < cfg.maxIter && delta >= cfg.tol) {
      val t0 = System.nanoTime()
      val contrib = spmv(prep, x).persist(StorageLevel.MEMORY_AND_DISK)
      // ‖αPᵀx‖₁-style scalar: eᵀ(Pᵀx) (all weights/ranks ≥ 0 ⇒ sum = norm-1)
      val sY = Option(contrib.agg(sum(col("y"))).head().get(0))
        .map(_.asInstanceOf[Double]).getOrElse(0.0)
      val omega = 1.0 - cfg.alpha * sY

      val teleport = vDf match {
        case Some(v) => // y += ω·v with explicit personalization vector
          (xdf: DataFrame) => xdf.join(v, Seq("id"), "left")
            .withColumn("tele", lit(omega) * coalesce(col("v"), lit(0.0)))
        case None =>
          (xdf: DataFrame) => xdf.withColumn("tele", lit(omega / n))
      }
      // Each iteration references x twice (SpMV + the update join), so the
      // logical plan would double per step — truncate lineage eagerly every
      // iteration (the residual aggregate materializes the data regardless).
      val next = teleport(
          x.withColumnRenamed("rank", "rank_prev")
            .join(contrib, Seq("id"), "left"))
        .withColumn("rank",
          lit(cfg.alpha) * coalesce(col("y"), lit(0.0)) + col("tele"))
        .select(col("id"), col("rank"),
          abs(col("rank") - col("rank_prev")).as("diff"))
        .localCheckpoint(true)

      val row = next.agg(sum(col("diff")), sum(col("rank"))).head()
      delta = row.getDouble(0)
      val rankSum = row.getDouble(1)
      iter += 1
      val wallMs = (System.nanoTime() - t0) / 1000000L
      trace += IterMetric(runId, iter, delta, rankSum, wallMs)

      x.unpersist(false)
      contrib.unpersist(false)
      x = next.select(col("id"), col("rank"))

      val converged = delta < cfg.tol
      if (converged || (cfg.checkpointDir.isDefined && iter % cfg.checkpointEvery == 0)) {
        cfg.checkpointDir.foreach { dir =>
          val path = TableIO.commitSnapshot(x, s"$dir/$runId", s"iter_$iter")
          x = spark.read.parquet(path)
          // K1 convergence-trace sink: append only the not-yet-flushed rows.
          val fresh = trace.toSeq.drop(flushedUpTo)
          if (fresh.nonEmpty) TableIO.appendRows(fresh.toDF(), s"$dir/$runId/_metrics")
          flushedUpTo = trace.size
        }
      }
      if (converged) reason = ConvergedReason.ResidualBelowTol
    }

    (x.select(col("id"), col("rank")).as[VertexRank],
      PageRankStats(iter, delta, reason, trace.toSeq))
  }

  private def initialX(g: LinkGraph, n: Long, vDf: Option[DataFrame]): DataFrame =
    vDf match {
      case Some(v) => g.vertices.join(v, Seq("id"), "left")
        .select(col("id"), coalesce(col("v"), lit(0.0)).as("rank"))
      case None => g.vertices.withColumn("rank", lit(1.0 / n))
    }
}
