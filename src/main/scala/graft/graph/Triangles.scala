package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.Edge

/** Triangle counting over the undirected simple graph underlying the link
  * graph. Degree-ordered edge orientation (each undirected edge kept once,
  * directed from the lower-(degree, id) endpoint to the higher) bounds every
  * vertex's oriented out-degree by O(√m), which bounds the wedge join — the
  * standard scalable formulation (Suri & Vassilvitskii, WWW'11). The count is
  * orientation-invariant, so a plain src<dst SQL oracle agrees exactly.
  */
object Triangles {

  /** Undirected simple edge set, canonicalized to src < dst. */
  def undirected(edges: Dataset[Edge]): DataFrame =
    edges.select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** Total triangle count. */
  def count(edges: Dataset[Edge]): Long = {
    val und = undirected(edges).persist(StorageLevel.MEMORY_AND_DISK)
    und.count()

    // degree in the undirected simple graph
    val deg = und.select(col("u").as("id")).union(und.select(col("v").as("id")))
      .groupBy(col("id")).agg(expr("count(1)").as("deg"))

    // orient each edge from lower (deg, id) to higher (deg, id)
    val du = deg.select(col("id").as("u"), col("deg").as("du"))
    val dv = deg.select(col("id").as("v"), col("deg").as("dv"))
    val oriented = und.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("a"),
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    oriented.count()
    und.unpersist(false)

    // wedges a→b, a→c (b<c so each unordered pair appears once); every
    // triangle has exactly one pivot a in the degree orientation
    val e1 = oriented.select(col("a"), col("b"))
    val e2 = oriented.select(col("a"), col("b").as("c"))
    val wedges = e1.join(e2, "a").where(col("b") < col("c"))
    // close the wedge with an oriented edge in either direction; `closing`
    // has distinct (b,c) pairs, so the inner join keeps wedge multiplicity
    val closing = oriented.select(col("a").as("b"), col("b").as("c"))
      .union(oriented.select(col("b").as("b"), col("a").as("c")))
    val n = wedges.join(closing, Seq("b", "c"), "inner").count()
    oriented.unpersist(false)
    n
  }

  /** Per-vertex triangle participation counts (id, triangles). */
  def perVertex(edges: Dataset[Edge], vertices: DataFrame): DataFrame = {
    val und = undirected(edges).persist(StorageLevel.MEMORY_AND_DISK)
    und.count()
    val e1 = und.select(col("u").as("a"), col("v").as("b"))
    val e2 = und.select(col("u").as("a"), col("v").as("c"))
    val wedges = e1.join(e2, "a").where(col("b") < col("c"))
    val tris = wedges.join(und.select(col("u").as("b"), col("v").as("c")),
        Seq("b", "c"), "inner")
      .select(col("a"), col("b"), col("c"))
    val counts = tris.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(expr("count(1)").as("triangles"))
    val out = vertices.join(counts, Seq("id"), "left")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
    und.unpersist(false)
    out
  }
}
