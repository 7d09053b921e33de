package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.PageRank
import graft.model.PageRankConfig

/** Physical-plan quality gates: the 100 TB posture depends on these plan
  * shapes, so they are asserted, not hoped for.
  */
class PlanSpec extends AnyFunSuite with SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("parquet scan gets predicate pushdown and column pruning (r1)") {
    val df = SparkEntry.queries("r1_agg_pushdown")(spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$p")
    // pruned read schema: only the 5 referenced columns reach the scan
    val readSchema = "ReadSchema: struct<(.*?)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(readSchema.split(",").length <= 5, s"scan reads too many columns: $readSchema")
    assert(!readSchema.contains("l_orderkey"), s"unpruned column: $readSchema")
  }

  test("SpMV join is a shuffled hash join — never a broadcast of the rank vector") {
    val g = TestdataGraph.linkGraph(spark, "/root/testdata/sf0.001")
    val prep = PageRank.prepare(g, PageRankConfig())
    val x = g.vertices.withColumn("rank", lit(1.0 / g.numVertices))
    val full = plan(PageRank.spmv(prep, x))
    // judge only the per-iteration plan: everything under InMemoryRelation is
    // the one-time cached graph build, where broadcasts are fine
    val p = full.split("InMemoryRelation").head
    assert(p.contains("ShuffledHashJoin"), s"expected ShuffledHashJoin in:\n$p")
    // the rank-vector side must not be broadcast (driver-serialized O(V))
    assert(!p.contains("BroadcastHashJoin"), s"rank vector broadcast in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("whole-stage codegen covers the SpMV aggregate pipeline") {
    val g = TestdataGraph.linkGraph(spark, "/root/testdata/sf0.001")
    val prep = PageRank.prepare(g, PageRankConfig())
    val x = g.vertices.withColumn("rank", lit(1.0 / g.numVertices))
    val p = plan(PageRank.spmv(prep, x))
    assert(p.contains("*("), s"no WholeStageCodegen spans in:\n$p") // codegen'd stages marked *(n)
  }

  test("exact dedup aggregates partially before its exchange (t3)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = plan(graft.pipeline.Dedup.exact(df))
    // the groupBy+rejoin form: duplicate-heavy groups collapse map-side, so
    // a partial HashAggregate must sit below the exchange (the old window
    // form shipped every row's full text unreduced through a sort)
    assert(p.contains("partial_min") && p.contains("partial_count"),
      s"no partial aggregation in:\n$p")
    assert(!p.contains("Window"), s"window form regressed:\n$p")
  }

  test("blocked truncate round-trips every row exactly (strings/arrays/nulls)") {
    import spark.implicits._
    import org.apache.spark.sql.GraftSqlInternals
    // mixed widths: fixed-size doubles, variable strings, arrays, nulls
    val df = (0 until 5000).map { i =>
      (i.toLong,
        if (i % 7 == 0) null else "s" * (i % 50) + i,
        i * 0.125,
        if (i % 11 == 0) null else Seq.tabulate(i % 6)(j => (i * j).toDouble))
    }.toDF("id", "s", "d", "arr")
    val t = GraftSqlInternals.truncate(df.repartition(7))
    val a = df.collect().map(_.toString).sorted
    val b = t.df.collect().map(_.toString).sorted
    assert(a.sameElements(b), "blocked cache lost or altered rows")
    // observe metrics ride the materializing job and match a direct agg
    val (t2, obs) = GraftSqlInternals.truncateObserved(
      df.observe("m", sum(col("d")), count(lit(1))))
    assert(obs("m").getDouble(0) == df.agg(sum(col("d"))).head().getDouble(0))
    assert(obs("m").getLong(1) == 5000L)
    assert(t2.df.count() == 5000L)
    t.handle.unpersist(false); t2.handle.unpersist(false)
  }

  test("fixed-stride truncate: null-free fixed-width frames take the packed layout and round-trip") {
    import spark.implicits._
    import org.apache.spark.sql.{GraftRowChunk, GraftSqlInternals}
    // the iterate shape: all fixed-width, no nulls → fixed-stride chunks
    val df = (0 until 20000).map(i => (i.toLong, 1.0 / (i + 1), i % 3))
      .toDF("id", "rank", "tag")
    val t = GraftSqlInternals.truncate(df.repartition(5))
    val chunks = t.handle.asInstanceOf[org.apache.spark.rdd.RDD[GraftRowChunk]]
      .collect()
    assert(chunks.nonEmpty && chunks.forall(_.stride == 32), // bitset + 3 slots
      s"expected 3-slot fixed-stride chunks, got strides ${chunks.map(_.stride).toSet}")
    assert(chunks.map(_.n).sum == 20000)
    assert(chunks.forall(_.offsets.isEmpty), "fixed-stride chunk kept an offsets index")
    val a = df.collect().map(_.toString).sorted
    val b = t.df.collect().map(_.toString).sorted
    assert(a.sameElements(b), "fixed-stride cache lost or altered rows")

    // nulls are just bitset bits — the layout stays fixed-stride and exact
    val dfN = (0 until 5000).map(i =>
      (i.toLong, if (i >= 2500 && i % 97 == 0) None else Some(i * 0.5)))
      .toDF("id", "maybe").coalesce(1)
    val tN = GraftSqlInternals.truncate(dfN)
    val chunksN = tN.handle.asInstanceOf[org.apache.spark.rdd.RDD[GraftRowChunk]]
      .collect()
    assert(chunksN.nonEmpty && chunksN.forall(_.stride == 24),
      s"nullable fixed-width frame should stay packed, got strides ${chunksN.map(_.stride).toSet}")
    val aN = dfN.collect().map(_.toString).sorted
    val bN = tN.df.collect().map(_.toString).sorted
    assert(aN.sameElements(bN), "nullable fixed-stride cache lost or altered rows")
    t.handle.unpersist(false); tN.handle.unpersist(false)
  }

  test("flagship entry() returns ranked conversations (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length > 0)
    // ranks are a probability vector over the vertex domain
    val s = rows.map(_.getAs[Double]("rank")).sum
    assert(math.abs(s - 1.0) < 1e-6)
  }
}
