package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset, GraftSqlInternals}
import org.apache.spark.sql.functions._

import graft.model._
import graft.util.SmallSvd

/** Restarted Arnoldi PageRank — Spark rebuild of the reference's
  * `ComputePageRank_AlgArnoldi` (/root/reference/ppagerank.cc:505-677).
  *
  * Per restart: build a k-step Arnoldi factorization M·Vₖ = Vₖ₊₁·H of the
  * FULL PageRank operator M x = αPᵀx + (α·dᵀx + (1−α)·eᵀx)·v
  * (PageRankMult, ppagerank.cc:692-718), subtract the identity from H
  * (ppagerank.cc:591-594), take the right singular vector of the smallest
  * singular value of H (gesvd at 596-643 — here a driver-side Jacobi SVD,
  * SmallSvd), and restart from x = V·v_min (645-647). Convergence:
  * ‖Mx − x‖₁ / ‖x‖₁ < tol (649-657).
  *
  * Spark shape: the k basis vectors live as k columns of ONE id-aligned
  * frame (never k separate shuffles); each Arnoldi step is one SpMV job plus
  * two batched-dot-products jobs (VecMTDot ≙ a single multi-sum aggregate).
  * The second dot pass is CGS2 re-orthogonalization ("twice is enough") —
  * the reference's single-pass classical Gram-Schmidt (VecMTDot + VecMAXPY,
  * ppagerank.cc:573-587) loses orthogonality near convergence and floors
  * the residual around 1e-10; the repeat pass pushes the attainable floor
  * to ~1e-13. It also lets ‖g‖ and the eᵀ/dᵀ sums of each new basis vector
  * be MEASURED in the same aggregate instead of propagated analytically
  * (cancellation-free where the analytic recursions drift).
  *
  * Deviation from the reference: the reference leaves the final iterate
  * ‖·‖₂-normalized with arbitrary sign (its output sink is unimplemented,
  * ppagerank_main.cc:426-471); we sign-fix and L1-normalize the returned
  * ranks so they form a probability vector like the other solvers.
  */
object ArnoldiPageRank {

  final case class ArnoldiConfig(
      alpha: Double = 0.85,
      tol: Double = 1e-7,
      k: Int = 8, // hardcoded 8 in the reference (ppagerank.cc:509)
      maxRestarts: Int = 1250,
      saltThreshold: Int = 0,
      saltBuckets: Int = 8,
      /** Re-orthogonalization (CGS2). None = auto: start with
        * single-reduction classical Gram-Schmidt for tol ≥ 1e-9 (one
        * observe job per Arnoldi step — β, eᵀ, dᵀ of the new basis vector
        * derived analytically via ‖g‖² = ‖w‖² − Σh²), ESCALATING to
        * measured CGS2 (two jobs per step, residual floor ~1e-13) if the
        * restart residual stagnates: the analytic β cancels catastrophically
        * once β/‖w‖ nears √ε, and where that floor lands depends on α and
        * the spectrum (measured: fine at α=0.85/tol 1e-7, stalls at 1.8e-7
        * for α=0.95), so it cannot be predicted from tol alone.
        * Some(true/false) pins the mode and disables the auto-escalation.
        * The reference is single-pass CGS + a norm reduction
        * (ppagerank.cc:573-587) — the fast path here is one reduction
        * CHEAPER than that, the deep path one more accurate.
        */
      reorthog: Option[Boolean] = None,
      /** North-rule resumability: the restart vector x IS the whole solver
        * state (the V basis is rebuilt from it each restart), so a snapshot
        * per `checkpointEvery` restarts — with per-partition lineage — lets
        * `run(resume = true)` continue from the last validated restart; the
        * scalar sums are re-measured from the snapshot.
        */
      checkpointDir: Option[String] = None,
      checkpointEvery: Int = 5)

  def run(g: LinkGraph, cfg: ArnoldiConfig = ArnoldiConfig(),
      runId: String = "arnoldi",
      personalization: Option[DataFrame] = None,
      resume: Boolean = false): (Dataset[VertexRank], PageRankStats) = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val n = g.numVertices
    val alpha = cfg.alpha
    val k = cfg.k
    // personalization v (ppagerank.cc:91-104) rides as a column; the full
    // operator becomes M x = αPᵀx + (α·dᵀx + (1−α)·eᵀx)·v
    val hasV = personalization.isDefined
    val vCol = if (hasV) col("v") else lit(1.0 / n)
    graft.util.ShuffleWidth.withWidth(spark, g.edges.rdd.getNumPartitions) {
    val prep = PageRank.prepare(g,
      PageRankConfig(saltThreshold = cfg.saltThreshold, saltBuckets = cfg.saltBuckets))

    val srcs = g.edges.select(col("src").as("id")).distinct().withColumn("nd", lit(1))
    val base0 = g.vertices.join(srcs, Seq("id"), "left")
      .select(col("id"), when(col("nd").isNull, 1.0).otherwise(0.0).as("dang"))
    val base = personalization match {
      case Some(p) => base0
        .join(p.select(col("id"), col("v").cast("double")), Seq("id"), "left")
        .select(col("id"), col("dang"), coalesce(col("v"), lit(0.0)).as("v"))
      case None => base0
    }
    val carry = Seq(col("id"), col("dang")) ++ (if (hasV) Seq(col("v")) else Nil)

    /** w = M x for column `xc` of `frame`, given the scalars eᵀx, dᵀx.
      * Pure plan transformation (no action): adds column `w`.
      */
    def mMult(frame: DataFrame, xc: String, ex: Double, dx: Double): DataFrame = {
      val yraw = PageRank.spmv(prep,
        frame.select(col("id"), col(xc).as("rank"))).withColumnRenamed("y", "yraw")
      // teleport (and every other measured scalar below) travels through
      // the codegen REFERENCES array (stableLit), never an inline literal:
      // parallel-sum reduction order perturbs these doubles in the last ulp
      // between runs, so a `lit` would change the generated source every
      // run and force a full Janino recompile of every Arnoldi-step stage
      // (~95 classes per solve — measured as the dominant, environment-
      // sensitive cost of this solver before the fix)
      val teleport = alpha * dx + (1 - alpha) * ex
      frame.join(yraw.hint("shuffle_hash"), Seq("id"), "left")
        .withColumn("w",
          lit(alpha) * coalesce(col("yraw"), lit(0.0)) +
            GraftSqlInternals.stableLit(teleport) * vCol)
        .drop("yraw")
    }

    // Resume (north rule): x is the whole inter-restart state; scalars are
    // re-measured below, identically for a cold and a resumed start.
    var startRestart = 0
    val resumed: Option[DataFrame] = if (resume) {
      cfg.checkpointDir.flatMap { dir =>
        graft.ingest.TableIO.latestValidSnapshot(spark, s"$dir/$runId", "restart_")
          .map { case (kk, snap) => startRestart = kk; snap }
      }
    } else None

    // x₀ = v (ppagerank.cc:544-550)
    val tr0 = GraftSqlInternals.truncate(resumed.getOrElse(
      base.withColumn("x", if (hasV) col("v") else lit(1.0 / n))))
    var x = tr0.df
    var xHandle: Option[org.apache.spark.sql.GraftSqlInternals.Truncated] = Some(tr0)
    var (ex, dx, xNorm2, xNorm1) = {
      val r = x.agg(sum(col("x")), sum(col("dang") * col("x")),
        sum(col("x") * col("x")), sum(abs(col("x")))).head()
      (r.getDouble(0), r.getDouble(1), math.sqrt(r.getDouble(2)), r.getDouble(3))
    }

    val trace = scala.collection.mutable.ArrayBuffer[IterMetric]()
    var flushedUpTo = 0
    var restart = startRestart
    var delta = Double.MaxValue
    var reason: ConvergedReason = ConvergedReason.MaxIterations
    // fast single-reduction CGS for relaxed tolerances; escalated to CGS2
    // when the restart residual stagnates at the fast path's cancellation
    // floor (see ArnoldiConfig.reorthog)
    var cgs2 = cfg.reorthog.getOrElse(cfg.tol < 1e-9)
    var stagnant = 0

    while (restart < cfg.maxRestarts && delta >= cfg.tol) {
      val t0 = System.nanoTime()
      val h = Array.ofDim[Double](k + 1, k) // (k+1)×k, ppagerank.cc:527
      // v0 = x/‖x‖₂ (ppagerank.cc:556-559)
      var frame = x.withColumn("v0",
        col("x") / GraftSqlInternals.stableLit(xNorm2)).drop("x")
      var ev = ex / xNorm2 // eᵀv_j
      var dv = dx / xNorm2 // dᵀv_j
      val evs = Array.fill(k + 1)(0.0); evs(0) = ev
      val dvs = Array.fill(k + 1)(0.0); dvs(0) = dv
      var effK = 0 // columns of H actually built
      var breakdown = false

      var j = 0
      var prevHandle: Option[org.apache.spark.sql.GraftSqlInternals.Truncated] = None
      // release the previous truncated frame only AFTER an action has
      // materialized its successor — localCheckpoint truncates lineage, so
      // unpersisting earlier would lose the only copy of the data
      def retire(t: org.apache.spark.sql.GraftSqlInternals.Truncated): Unit = {
        prevHandle.foreach(_.handle.unpersist(false))
        prevHandle = Some(t)
      }
      while (j < k && !breakdown) {
        // w = M v_j; H(i,j) = vᵢᵀw for i ≤ j (VecMTDot, ppagerank.cc:573)
        frame = mMult(frame, s"v$j", evs(j), dvs(j))
        if (!cgs2) {
          // ONE observe job per step: dots, ‖w‖², eᵀw, dᵀw all ride the
          // tasks that materialize w; β and the eᵀ/dᵀ sums of the new basis
          // vector follow analytically (β² = ‖w‖² − Σh² by orthogonality)
          val dotCols = (0 to j).map(i => sum(col(s"v$i") * col("w"))) ++
            Seq(sum(col("w") * col("w")), sum(col("w")), sum(col("dang") * col("w")))
          val (t1, obs1) = GraftSqlInternals.truncateObserved(
            frame.observe("dots", dotCols.head, dotCols.tail: _*))
          frame = t1.df
          val row = obs1("dots")
          retire(t1)
          for (i <- 0 to j) h(i)(j) = row.getDouble(i)
          val ww = row.getDouble(j + 1)
          val ew = row.getDouble(j + 2)
          val dw = row.getDouble(j + 3)
          val beta2 = ww - (0 to j).map(i => h(i)(j) * h(i)(j)).sum
          val beta = math.sqrt(math.max(beta2, 0.0))
          h(j + 1)(j) = beta
          effK = j + 1
          if (beta < 1e-12 * math.sqrt(ww)) {
            breakdown = true // happy breakdown: Krylov space exhausted
          } else {
            val gCol = (0 to j).foldLeft(col("w")) { (acc, i) =>
              acc - GraftSqlInternals.stableLit(h(i)(j)) * col(s"v$i")
            }
            frame = frame.withColumn(s"v${j + 1}",
              gCol / GraftSqlInternals.stableLit(beta)).drop("w")
            evs(j + 1) = (ew - (0 to j).map(i => h(i)(j) * evs(i)).sum) / beta
            dvs(j + 1) = (dw - (0 to j).map(i => h(i)(j) * dvs(i)).sum) / beta
          }
        } else {
          val dotCols = (0 to j).map(i => sum(col(s"v$i") * col("w"))) ++
            Seq(sum(col("w") * col("w")))
          // batched VecMTDot rides as CollectMetrics accumulators on the
          // materializing tasks (single-action kernel, as in PageRank.run)
          val (t1, obs1) = GraftSqlInternals.truncateObserved(
            frame.observe("dots", dotCols.head, dotCols.tail: _*))
          frame = t1.df
          val row = obs1("dots")
          retire(t1)
          for (i <- 0 to j) h(i)(j) = row.getDouble(i)
          val ww = row.getDouble(j + 1)
          // g = w − Σ h(i,j)·vᵢ, then CGS2: measure the residual projections
          // c_i = vᵢᵀg (≈0 in exact arithmetic), fold them back into H, and
          // measure ‖g‖², eᵀg, dᵀg directly in the same aggregate
          val gCol = (0 to j).foldLeft(col("w")) { (acc, i) =>
            acc - GraftSqlInternals.stableLit(h(i)(j)) * col(s"v$i")
          }
          frame = frame.withColumn("g", gCol).drop("w")
          val dotCols2 = (0 to j).map(i => sum(col(s"v$i") * col("g"))) ++
            Seq(sum(col("g") * col("g")), sum(col("g")), sum(col("dang") * col("g")))
          val (t2, obs2) = GraftSqlInternals.truncateObserved(
            frame.observe("dots2", dotCols2.head, dotCols2.tail: _*))
          frame = t2.df
          val row2 = obs2("dots2")
          retire(t2)
          val c = Array.tabulate(j + 1)(i => row2.getDouble(i))
          val gg = row2.getDouble(j + 1)
          val eg = row2.getDouble(j + 2)
          val dg = row2.getDouble(j + 3)
          for (i <- 0 to j) h(i)(j) += c(i)
          // β = ‖g − Σ cᵢvᵢ‖₂ via the identity on the measured gᵀg — safe here
          // because the c correction is O(ε)·‖g‖, so no catastrophic cancellation
          val beta2 = gg - c.map(x => x * x).sum
          val beta = math.sqrt(math.max(beta2, 0.0))
          h(j + 1)(j) = beta
          effK = j + 1
          if (beta < 1e-12 * math.sqrt(ww)) {
            breakdown = true // happy breakdown: Krylov space exhausted
          } else {
            val g2Col = (0 to j).foldLeft(col("g")) { (acc, i) =>
              acc - GraftSqlInternals.stableLit(c(i)) * col(s"v$i")
            }
            frame = frame.withColumn(s"v${j + 1}",
              g2Col / GraftSqlInternals.stableLit(beta)).drop("g")
            evs(j + 1) = (eg - (0 to j).map(i => c(i) * evs(i)).sum) / beta
            dvs(j + 1) = (dg - (0 to j).map(i => c(i) * dvs(i)).sum) / beta
          }
        }
        j += 1
      }

      // H ← H − [I; 0] (ppagerank.cc:591-594), on the effK-sized block
      val m = effK
      val hBlock = Array.tabulate(m + 1, m) { (i, jj) =>
        h(i)(jj) - (if (i == jj) 1.0 else 0.0)
      }
      val (_, vMat) = SmallSvd.svd(hBlock)
      val vmin = Array.tabulate(m)(i => vMat(i)(m - 1)) // smallest σ's right vector

      // x ← Σ vmin_i · v_i (VecMAXPY, ppagerank.cc:645-647)
      val xCol = (0 until m).map(i =>
          GraftSqlInternals.stableLit(vmin(i)) * col(s"v$i"))
        .reduce((a, b) => a + b)
      // convergence: δ = ‖Mx − x‖₁/‖x‖₁ (ppagerank.cc:649-657). The
      // reference applies the operator once more (PageRankMult at 651); here
      // Mx − x follows from the Arnoldi relation M·Vₘ = Vₘ₊₁·H — exact to
      // rounding REGARDLESS of basis quality, because each v_{j+1} is
      // constructed as (w − Σ hᵢⱼ vᵢ)/β — so
      // Mx − x = Vₘ₊₁·(H − [I;0])·vmin, a column combination of basis
      // vectors already in the frame. The restart therefore pays NO extra
      // SpMV: residual, ‖x‖₁, dᵀx, ‖x‖₂ and eᵀx all ride one shuffle-free
      // observe job on the frame. On happy breakdown v_m was never built;
      // its coefficient is β·vmin_{m−1} with β < 1e-12·‖w‖ — dropped.
      val rCoef = Array.tabulate(m + 1)(i =>
        (0 until m).map(jj => hBlock(i)(jj) * vmin(jj)).sum)
      val residCol = (0 to (if (breakdown) m - 1 else m)).map(i =>
          GraftSqlInternals.stableLit(rCoef(i)) * col(s"v$i"))
        .reduce((a, b) => a + b)
      val (tr2, obsR) = GraftSqlInternals.truncateObserved(
        frame.withColumn("x", xCol)
          .observe("restart", sum(abs(residCol)), sum(abs(col("x"))),
            sum(col("dang") * col("x")), sum(col("x") * col("x")),
            sum(col("x")))
          .select(carry :+ col("x"): _*))
      val row = obsR("restart")
      val num = row.getDouble(0)
      xNorm1 = row.getDouble(1)
      dx = row.getDouble(2)
      xNorm2 = math.sqrt(row.getDouble(3))
      ex = row.getDouble(4) // measured eᵀx (an analytic recursion drifts)
      delta = num / xNorm1
      x = tr2.df
      // the basis-vector frame and the previous restart's x are dead now
      prevHandle.foreach(_.handle.unpersist(false))
      xHandle.foreach(_.handle.unpersist(false))
      xHandle = Some(tr2)

      restart += 1
      // stagnation → escalate to CGS2 (auto mode only): two consecutive
      // restarts without ≥10% residual improvement means the fast path has
      // hit its analytic-β cancellation floor above tol — without this the
      // solver would spin to maxRestarts at a flat residual
      if (!cgs2 && cfg.reorthog.isEmpty && delta >= cfg.tol) {
        val prev = trace.lastOption.map(_.residual).getOrElse(Double.MaxValue)
        if (delta > 0.9 * prev) stagnant += 1 else stagnant = 0
        if (stagnant >= 2) cgs2 = true
      }
      trace += IterMetric(runId, restart, delta, xNorm1, (System.nanoTime() - t0) / 1000000L)
      val converged = delta < cfg.tol
      if (converged || (cfg.checkpointDir.isDefined && restart % cfg.checkpointEvery == 0)) {
        cfg.checkpointDir.foreach { dir =>
          x = graft.ingest.TableIO.commitSnapshotWithLineage(
            x, s"$dir/$runId", runId, "restart_", restart)
          val fresh = trace.toSeq.drop(flushedUpTo)
          if (fresh.nonEmpty)
            graft.ingest.TableIO.appendRows(fresh.toDF(), s"$dir/$runId/_metrics")
          flushedUpTo = trace.size
        }
      }
      if (converged) reason = ConvergedReason.ResidualBelowTol
    }

    prep.close()
    // sign-fix + L1-normalize (deviation from reference; see scaladoc).
    // eᵀx of the final iterate is `ex` — measured by the observe of the job
    // that materialized this x (restart loop) or by the init aggregate (no
    // restarts ran); a dedicated agg job here re-measured the same sum.
    val signedSum = ex
    val sign = if (signedSum < 0) -1.0 else 1.0
    val ranks = x.select(col("id"),
      (col("x") * lit(sign) /
        GraftSqlInternals.stableLit(math.abs(signedSum))).as("rank")).as[VertexRank]
    (ranks, PageRankStats(restart, delta, reason, trace.toSeq))
    } // withWidth
  }
}
