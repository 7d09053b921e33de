package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.Edge

/** Synchronous label propagation (community detection) with deterministic
  * min-tiebreak — the north rule requires exact, order-independent labels.
  *
  * Semantics (ours, defined precisely so the SQL oracle can replicate them):
  *  - labels start as the vertex id;
  *  - each round, vertex v takes the most frequent label among its incoming
  *    neighbors' labels (edge multiplicity/weight ignored: one neighbor = one
  *    vote); ties break toward the SMALLEST label; vertices with no incoming
  *    neighbors keep their current label;
  *  - runs a fixed number of synchronous rounds (no damping, no async).
  */
object LabelPropagation {

  def run(edges: Dataset[Edge], vertices: DataFrame, rounds: Int = 5): DataFrame = {
    val adj = edges.select(col("src"), col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()

    var labels = vertices.select(col("id"), col("id").as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var r = 0
    while (r < rounds) {
      val votes = adj.join(labels, adj("src") === labels("id"))
        .groupBy(adj("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("n"))
      // deterministic argmax: max count, then min label — a single
      // max_by over an orderable struct (no window, one shuffle).
      val winner = votes
        .groupBy(col("id"))
        .agg(max(struct(col("n"), (-col("label")).as("neg"), col("label"))).as("w"))
        .select(col("id"), col("w.label").as("newlabel"))
      // labels referenced 2× per round — truncate lineage every round
      val next = labels.join(winner, Seq("id"), "left")
        .select(col("id"), coalesce(col("newlabel"), col("label")).as("label"))
        .localCheckpoint(true)
      labels.unpersist(false)
      labels = next
      r += 1
    }
    adj.unpersist(false)
    labels
  }
}
