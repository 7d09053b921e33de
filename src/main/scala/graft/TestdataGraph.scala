package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.graph.{GraphOps, LinkGraph}
import graft.model.Turn

/** Bridges the driver's TPC-H-ish testdata to the engine's transcript data
  * model so every graph operator is cross-checkable against the DuckDB
  * oracle: the `events` table is viewed as transcripts (one conversation per
  * user, turns ordered by (ts, event_id)), with click events carrying a
  * deterministic `invoke:<conv>` link derived from the event value. All
  * derivation arithmetic is exact-integer so both engines agree bitwise.
  */
object TestdataGraph {

  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  /** Transcript view of events — schema = north-rule input_hint. */
  def transcripts(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val nUsers = ev.agg(max(col("user_id"))).head().getLong(0) + 1
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(
      concat(lit("u"), col("user_id").cast("string")).as("conv_id"),
      (row_number().over(w) - 1).cast("int").as("turn_idx"),
      col("event_type").as("role"),
      col("props").as("text"),
      // users with id ≡ 3 (mod 7) never emit links → deterministic dangling
      // vertices, so the ω dangling-mass fold is exercised by the SQL oracle
      when(col("event_type") === "click" && col("user_id") % 7 =!= 3,
        concat(lit("invoke:u"),
          (floor(col("value")).cast("long") % nUsers).cast("string")))
        .otherwise(lit(null).cast("string")).as("tool"),
      col("ts"),
      col("user_id"))
  }

  /** Raw derived edges (src, dst, weight = multiplicity) over user-id
    * vertices, via the engine's stable-turn-ordering link derivation.
    */
  def rawEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = transcripts(spark, dir)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts").as[Turn]
    GraphOps.linkPairs(t)
      .select(
        expr("CAST(substr(src_conv, 2) AS BIGINT)").as("src"),
        expr("CAST(substr(dst_conv, 2) AS BIGINT)").as("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("double").as("weight"))
  }

  // graph build memoized per (session, dir): Verify/Bench call many graph
  // queries against the same sf dir — one build, one persist
  private val cache = scala.collection.concurrent.TrieMap[(SparkSession, String), LinkGraph]()

  /** Full LinkGraph over the events-derived edges; vertex domain = users
    * with events ∪ link targets (ids are already numeric — no dictionary).
    */
  def linkGraph(spark: SparkSession, dir: String): LinkGraph =
    cache.getOrElseUpdate((spark, dir), buildLinkGraph(spark, dir, transpose = false))

  /** Transposed (-trans) variant: reversed edges, column-sum normalization. */
  def linkGraphTrans(spark: SparkSession, dir: String): LinkGraph =
    cache.getOrElseUpdate((spark, dir + "#trans"),
      buildLinkGraph(spark, dir, transpose = true))

  private def buildLinkGraph(spark: SparkSession, dir: String,
      transpose: Boolean): LinkGraph = {
    val fwd = rawEdges(spark, dir)
    val raw = if (!transpose) fwd
      else fwd.select(col("dst").as("src"), col("src").as("dst"), col("weight"))
    val verts = events(spark, dir).select(col("user_id").as("id")).distinct()
      .union(fwd.select(col("dst").as("id")))
      .distinct()
    val dict = verts.select(concat(lit("u"), col("id").cast("string")).as("conv_id"), col("id"))
    GraphOps.normalizeFrom(raw, verts, dict)
  }
}
