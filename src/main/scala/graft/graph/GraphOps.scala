package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{Edge, Turn}

/** A prepared link graph: degree-normalized edges + the full vertex domain
  * + the conv_id dictionary.
  *
  * `edges` is the Spark analogue of the reference's row-normalized CSR matrix
  * (/root/reference/petsc_util.cc:739-748 assembly +
  *  /root/reference/ppagerank.cc:252-268 normalization): hash-partitioned by
  * `src`, sorted within partitions by (src, dst) — the CSR/column-sort layout
  * of /root/reference/petsc_util.cc:714-722.
  */
final case class LinkGraph(
    edges: Dataset[Edge],      // normalized: weight = multiplicity / outsum(src)
    rawEdges: Dataset[Edge],   // weight = multiplicity (pre-normalization)
    vertices: DataFrame,       // (id: Long) — full domain incl. isolated/dangling
    dict: DataFrame,           // (conv_id: String, id: Long)
    numVertices: Long,
    numEdges: Long)

object GraphOps {

  /** Derive conv→conv link pairs from transcripts under *stable turn
    * ordering* (the input_hint invariant). A link turn is dropped when the
    * immediately preceding turn of the same conversation carries the same
    * link — consecutive-duplicate suppression is what makes the row order
    * semantic, realized with `lag` over Window.partitionBy(conv_id)
    * .orderBy(turn_idx).
    */
  def linkPairs(turns: Dataset[Turn]): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    turns.toDF()
      .withColumn("prev_tool", lag(col("tool"), 1).over(w))
      .where(col("tool").rlike("^(invoke|reply):") &&
        (col("prev_tool").isNull || col("prev_tool") =!= col("tool")))
      .select(
        col("conv_id").as("src_conv"),
        regexp_extract(col("tool"), "^(?:invoke|reply):(.+)$", 1).as("dst_conv"))
      .where(col("src_conv") =!= col("dst_conv")) // no self-loops in the link graph
  }

  /** conv_id → dense Long id dictionary.
    *
    * Scalable dense assignment: distinct ids are range-partitioned and sorted,
    * then numbered with `zipWithIndex` (one extra job to count partition
    * sizes, no single-partition window). Deterministic: ids follow the global
    * lexicographic order of conv_id.
    */
  def denseIdDict(convIds: DataFrame, partitions: Int = 0): DataFrame = {
    val spark = convIds.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val sorted = convIds.select(col("conv_id").cast("string")).distinct()
      .repartitionByRange(p, col("conv_id"))
      .sortWithinPartitions("conv_id")
      .as[String]
    sorted.rdd.zipWithIndex().toDF("conv_id", "id")
  }

  /** conv_id → xxhash64 id with collision check — the O(1) alternative for
    * the 10^12-turn tier, where a global sort for dense ids is an avoidable
    * shuffle. Throws if two distinct conv_ids collide (detection is exact).
    */
  def hashIdDict(convIds: DataFrame): DataFrame = {
    val d = convIds.select(col("conv_id").cast("string")).distinct()
      .withColumn("id", xxhash64(col("conv_id")))
    val Array(ids, hashes) = d.agg(
      count(lit(1)), countDistinct(col("id"))).head().toSeq.toArray.map(_.asInstanceOf[Long])
    require(ids == hashes, s"xxhash64 collision over conv_id domain ($ids ids, $hashes hashes)")
    d
  }

  /** Full pipeline: transcripts → LinkGraph.
    *
    * Duplicate (src, dst) pairs collapse to a single edge with
    * weight = multiplicity *before* normalization (FIXTURES.md G5 semantics;
    * the reference sums duplicate triplets into CSR the same way).
    * Normalization ≙ MatNormalizeForPageRank
    * (/root/reference/ppagerank.cc:169-274): weight → weight / outsum(src);
    * dangling vertices simply have no outgoing rows.
    */
  def fromTranscripts(turns: Dataset[Turn], denseIds: Boolean = true,
      buckets: Int = 0, transpose: Boolean = false): LinkGraph = {
    val spark = turns.sparkSession
    val pairs = linkPairs(turns)
    val convs = turns.select(col("conv_id")).distinct()
      .union(pairs.select(col("dst_conv").as("conv_id")))
      .distinct()
    val dict = (if (denseIds) denseIdDict(convs) else hashIdDict(convs))
      .persist()
    dict.count() // materialize once; reused for src and dst mapping

    val fwd = pairs
      .join(dict.withColumnRenamed("conv_id", "src_conv").withColumnRenamed("id", "src"), "src_conv")
      .join(dict.withColumnRenamed("conv_id", "dst_conv").withColumnRenamed("id", "dst"), "dst_conv")
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("double").as("weight"))
    // `-trans` (ppagerank_main.cc:121-122): interpret the stored matrix as
    // Aᵀ — normalization then divides by the ORIGINAL column sums and the
    // iteration walks incoming links (reverse PageRank). Transposing the
    // edge list before row-normalization is exactly the reference's
    // colsum + right-diagonal-scale path (ppagerank.cc:183-209).
    val raw = if (!transpose) fwd
      else fwd.select(col("dst").as("src"), col("src").as("dst"), col("weight"))
    normalizeFrom(raw, dict.select(col("id")), dict, buckets)
  }

  /** Build a LinkGraph from an already-derived raw edge table
    * (src, dst, weight=multiplicity) + vertex domain.
    */
  def normalizeFrom(raw: DataFrame, vertices: DataFrame, dict: DataFrame,
      buckets: Int = 0): LinkGraph = {
    val spark = raw.sparkSession
    import spark.implicits._

    // rawEdges stays persisted for the graph's lifetime: EdgeStore.write and
    // the i1/k-stat consumers re-read it, and recomputing it replays the full
    // upstream derivation (transcript scan + link window). Sessions that
    // build MANY graphs accumulate these caches — release them by
    // unpersisting g.rawEdges/g.edges/g.vertices when a graph is retired
    // (the bench/Verify mains build one memoized graph per (session, dir)).
    val rawEdges = raw.select(col("src").cast("long"), col("dst").cast("long"),
      col("weight").cast("double")).as[Edge].persist()
    val nE = rawEdges.count()
    // layout width follows the nonzero count (≙ the reference's nnz-weighted
    // row redistribution, /root/reference/petsc_util.cc:1093-1263), capped at
    // the configured session width: a small graph laid out at full machine
    // width pays a full task wave per iteration micro-stage for no work
    val p = if (buckets > 0) buckets
            else graft.util.ShuffleWidth.forEdges(nE,
              spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)

    // C1 stochastic normalization: per-src out-weight sum, then scale.
    // Window-free two-stage (groupBy + co-partitioned join) so the partial
    // aggregate combines map-side; both sides hash-partition on src.
    val outsum = rawEdges.groupBy(col("src")).agg(sum(col("weight")).as("outsum"))
    val normalized = rawEdges.toDF()
      .join(outsum, "src")
      .select(col("src"), col("dst"), (col("weight") / col("outsum")).as("weight"))
      .repartition(p, col("src"))
      .sortWithinPartitions(col("src"), col("dst")) // CSR-like layout
      .as[Edge]
      .persist()

    // vertex domain co-partitioned WITH the edge layout: every solver's
    // iterate frame inherits its partitioning from the vertex side of the
    // initial join, so a width mismatch here would re-exchange the edges in
    // EVERY iteration job (measured: 4 stages/step instead of 2)
    val verts = vertices.select(col("id").cast("long"))
      .repartition(p, col("id")).persist()
    val nV = verts.count()
    normalized.count() // materialize the layout before callers iterate on it
    LinkGraph(normalized, rawEdges, verts, dict, nV, nE)
  }

  /** Dangling vertex set: vertices with no out-edges — the explicit form of
    * the reference's nonzero-row indicator complement
    * (/root/reference/petsc_util.cc:1421-1484 via
    *  /root/reference/ppagerank.cc:244). Realized as an anti-join.
    */
  def danglingVertices(g: LinkGraph): DataFrame =
    g.vertices.join(g.edges.select(col("src").as("id")).distinct(), Seq("id"), "left_anti")

  /** Out-degrees (weighted) — ≙ the side `.degs` file of the BSMAT format
    * (/root/reference/petsc_util.cc:225-252).
    */
  def outDegrees(edges: Dataset[Edge]): DataFrame =
    edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg"), sum(col("weight")).as("outweight"))

  def inDegrees(edges: Dataset[Edge]): DataFrame =
    edges.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("indeg"), sum(col("weight")).as("inweight"))

  /** One-off describe-style matrix stats ≙ WriteSimpleMatrixStats
    * (/root/reference/ppagerank_main.cc:202-253): rows, nnz, norm-1
    * (max column abs sum), norm-inf (max row abs sum), plus the reference's
    * min/max spread — here min/max out-/in-degree over vertices that have at
    * least one edge in that direction (the reference's per-rank row/nnz
    * spread is partition balance, reported by `partitionBalance` instead,
    * since Spark re-partitions declaratively).
    */
  def matrixStats(g: LinkGraph): DataFrame = {
    val spark = g.edges.sparkSession
    val rowAgg = g.edges.groupBy(col("src"))
      .agg(sum(abs(col("weight"))).as("s"), count(lit(1)).as("deg"))
      .agg(max(col("s")), min(col("deg")), max(col("deg"))).head()
    val colAgg = g.edges.groupBy(col("dst"))
      .agg(sum(abs(col("weight"))).as("s"), count(lit(1)).as("deg"))
      .agg(max(col("s")), min(col("deg")), max(col("deg"))).head()
    import spark.implicits._
    Seq((g.numVertices, g.numEdges, colAgg.getDouble(0), rowAgg.getDouble(0),
      rowAgg.getLong(1), rowAgg.getLong(2), colAgg.getLong(1), colAgg.getLong(2)))
      .toDF("n_vertices", "n_edges", "norm_1", "norm_inf",
        "min_outdeg", "max_outdeg", "min_indeg", "max_indeg")
  }

  /** Per-partition balance of the edge layout ≙ the reference's per-rank
    * min/max rows/nnz report (/root/reference/ppagerank_main.cc:202-253):
    * (partition, n_edges, n_distinct_src).
    */
  def partitionBalance(g: LinkGraph): DataFrame =
    g.edges.toDF()
      .groupBy(spark_partition_id().as("partition"))
      .agg(count(lit(1)).as("n_edges"), countDistinct(col("src")).as("n_src"))
}
