package graft.model

import java.sql.Timestamp

/** Core data model for the graft link-graph engine.
  *
  * Mirrors the reference's abstractions (see SURVEY.md §1):
  *  - the transcripts table is the north-rule input (BASELINE.json input_hint)
  *  - `Edge` ≙ a sparse-matrix nonzero (i, j, v) triplet
  *    (/root/reference/petsc_util.cc:560-597 — BSMAT triplet decode)
  *  - `VertexRank` ≙ one entry of the PETSc rank `Vec`
  *    (/root/reference/petsc_util.cc:95-144)
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // null unless role='tool' or the turn carries a link ("invoke:<conv>"/"reply:<conv>")
    ts: Timestamp)

/** A directed weighted edge; after normalization weight = raw/outsum(src). */
final case class Edge(src: Long, dst: Long, weight: Double)

final case class VertexRank(id: Long, rank: Double)

/** Why an iterative solve stopped — mirrors the intended PRVS converged-reason
  * enum (/root/reference/pagacprvs.h:57-63).
  */
sealed trait ConvergedReason { def converged: Boolean }
object ConvergedReason {
  case object ResidualBelowTol extends ConvergedReason { val converged = true }
  case object MaxIterations extends ConvergedReason { val converged = false }
}

/** Solver configuration ≙ PageRankContext (/root/reference/ppagerank.h:30-52)
  * populated from options at /root/reference/ppagerank.cc:49-147.
  * Defaults match the reference: alpha 0.85 (ppagerank.cc:68-69),
  * tol 1e-7 (88-89), maxiter 10000 (85-86).
  */
final case class PageRankConfig(
    alpha: Double = 0.85,
    tol: Double = 1e-7,
    maxIter: Int = 10000,
    /** Reliable checkpoint root; every `checkpointEvery` iterations the rank
      * vector is snapshotted (atomic-rename protocol) so a killed job resumes.
      */
    checkpointDir: Option[String] = None,
    checkpointEvery: Int = 10,
    /** Out-degree above which a source vertex is treated as a hub and its
      * edge rows salted across sub-keys for the per-iteration join
      * (≙ the reference's nnz-weighted row redistribution,
      * /root/reference/petsc_util.cc:1093-1263). 0 disables salting.
      */
    saltThreshold: Int = 0,
    saltBuckets: Int = 8)

final case class IterMetric(
    run_id: String,
    iter: Int,
    residual: Double,
    rank_sum: Double,
    wall_ms: Long)

final case class PageRankStats(
    iterations: Int,
    residual: Double,
    reason: ConvergedReason,
    trace: Seq[IterMetric])
