package graft.util

import org.apache.spark.sql.SparkSession

/** Sizes the shuffle width of an iterative solver to the data it iterates.
  *
  * The per-iteration exchanges (SpMV group-by, label aggregation, …) are
  * planned from `spark.sql.shuffle.partitions`. That conf is sized for the
  * LARGEST job in the session; an iterative kernel over a graph whose edge
  * set fits a handful of partitions would still dispatch a full-width task
  * wave per stage, and with hundreds of micro-stages per solve the task
  * dispatch overhead dominates end-to-end cost (measured: a 16k-edge graph
  * at width 32 spends >80% of per-stage wall on scheduling). This is the
  * runtime analogue of the reference's nnz-weighted row redistribution
  * (/root/reference/petsc_util.cc:1093-1263): partition count follows the
  * nonzero count, not the machine width. AQE's coalescing does the same
  * thing dynamically; the solvers run with AQE off for plan stability, so
  * the width is chosen deterministically from the edge count instead.
  *
  * Only ever NARROWS: a graph wider than the configured width keeps the
  * configured width (a 100 TB edge set saturates the cluster; this helper
  * is a no-op there).
  */
object ShuffleWidth {

  /** Target edge rows per partition when sizing a graph's layout. ~250k
    * normalized-edge rows ≈ 8–12 MB — small enough that a partition's hash
    * join build side is L2-resident, large enough that a task's fixed cost
    * (dispatch, codegen instance, chunk alloc) stays <5% of its work.
    */
  val EdgesPerPartition: Long = 250000L

  /** Partition count for an edge set of `nEdges` rows under a configured
    * ceiling of `maxWidth`. Floor of 2, not 1: a 1-partition exchange plans
    * as `SinglePartition`, which EnsureRequirements does NOT treat as
    * co-partitioned with `HashPartitioning(key, 1)` — a width-1 layout made
    * every iteration join re-exchange BOTH sides (measured), while width 2
    * keeps real HashPartitionings that stay exchange-free across the
    * iterate/edge joins.
    */
  def forEdges(nEdges: Long, maxWidth: Int): Int =
    math.max(2L, math.min(maxWidth.toLong,
      (nEdges + EdgesPerPartition - 1) / EdgesPerPartition)).toInt

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily capped to
    * `width` (session-scoped conf, restored in finally). No-op when the
    * session is already at or below the cap, so full-scale runs are
    * untouched.
    *
    * Single-threaded-session assumption: the override is session-global, so
    * two solvers planning CONCURRENTLY on one SparkSession can observe each
    * other's width (and interleaved finallys can restore the wrong value),
    * and frames returned lazily from inside the scope plan at the restored
    * width. Every engine solver materializes (lineage-truncates) inside the
    * scope, and the mains drive solvers sequentially; concurrent solver use
    * needs a session clone (`spark.newSession`) per solver instead.
    */
  def withWidth[T](spark: SparkSession, width: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key, "200")
    val target = math.max(2, width) // see forEdges on the width-1 quirk
    if (target >= old.toInt) body
    else {
      spark.conf.set(key, target.toString)
      try body finally spark.conf.set(key, old)
    }
  }
}
