package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.GraphOps
import graft.ingest.TranscriptGen
import graft.model.Turn

class TranscriptSpec extends AnyFunSuite with SparkTestBase {
  import TranscriptGen._

  test("per-turn text equality under stable turn ordering (input_hint invariant)") {
    // Scan the generated table ordered by (conv_id, turn_idx) and compare
    // every field against the reference formula — the north-rule row check.
    val ds = generate(spark, nConv = 64, partitions = 7)
    val rows = ds.orderBy(col("conv_id"), col("turn_idx")).collect()
    assert(rows.length == (0 until 64).map(c => numTurns(DefaultSeed, c)).sum)
    rows.foreach { t =>
      val c = t.conv_id.stripPrefix("c").toLong
      assert(t.text == text(DefaultSeed, c, t.turn_idx), s"text mismatch at $t")
      assert(t.role == role(t.turn_idx))
      assert(t.tool == toolCol(DefaultSeed, c, t.turn_idx, 64))
    }
  }

  test("generation is deterministic and partition-count independent") {
    val a = generate(spark, 50, partitions = 3).collect().toSet
    val b = generate(spark, 50, partitions = 13).collect().toSet
    assert(a == b)
  }

  test("ts strictly increasing within a conversation") {
    val ds = generate(spark, 32)
    val bad = ds.toDF()
      .withColumn("prev", lag(col("ts"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("conv_id")).orderBy(col("turn_idx"))))
      .where(col("prev").isNotNull && col("ts") <= col("prev"))
    assert(bad.count() == 0)
  }

  test("~5% of conversations are dangling (emit no links)") {
    val n = 2000
    val dangling = (0 until n).count(c => isDangling(DefaultSeed, c))
    assert(dangling > n / 50 && dangling < n / 10, s"dangling=$dangling")
  }

  test("edge derivation: exact edge set on a hand-built transcript") {
    import spark.implicits._
    def t(c: String, i: Int, tool: String): Turn =
      Turn(c, i, if (i % 3 == 2) "tool" else "user", s"$c-$i", tool,
        new Timestamp(1704067200000L + i * 1000))
    val turns = Seq(
      t("a", 0, "reply:b"),       // a → b (reply link on turn 0)
      t("a", 1, null),
      t("a", 2, "invoke:c"),      // a → c
      t("a", 3, "invoke:c"),      // consecutive duplicate — suppressed by lag
      t("a", 4, "invoke:b"),      // a → b (again: multiplicity 2)
      t("b", 0, null),
      t("b", 1, "invoke:b"),      // self-loop — dropped
      t("c", 0, "invoke:a")       // c → a
    ).toDS()
    val g = GraphOps.fromTranscripts(turns)
    val dict = g.dict.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // dense ids follow lexicographic conv_id order
    assert(dict == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    val raw = g.rawEdges.collect().map(e => (e.src, e.dst) -> e.weight).toMap
    assert(raw == Map((0L, 1L) -> 2.0, (0L, 2L) -> 1.0, (2L, 0L) -> 1.0))
    // normalized: out-weights sum to 1 per non-dangling src
    val outsums = g.edges.groupBy(col("src")).agg(sum(col("weight")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    outsums.values.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
    // b is dangling (its only link was a self-loop)
    val dang = GraphOps.danglingVertices(g).collect().map(_.getLong(0)).toSet
    assert(dang == Set(1L))
  }

  test("-trans: transposed graph is the reversed edge set, column-normalized") {
    import spark.implicits._
    def t(c: String, i: Int, tool: String): Turn =
      Turn(c, i, "user", s"$c-$i", tool, new Timestamp(1704067200000L + i * 1000))
    val turns = Seq(
      t("a", 0, "reply:b"), t("a", 1, "invoke:c"), t("a", 2, "invoke:b"),
      t("b", 0, null), t("c", 0, "invoke:a")).toDS()
    val fwd = GraphOps.fromTranscripts(turns)
    val rev = GraphOps.fromTranscripts(turns, transpose = true)
    // raw edges of the transposed graph = swapped raw edges of the forward one
    val f = fwd.rawEdges.collect().map(e => (e.dst, e.src, e.weight)).toSet
    val r = rev.rawEdges.collect().map(e => (e.src, e.dst, e.weight)).toSet
    assert(f == r)
    // and normalization ran on the TRANSPOSED rows (original column sums):
    // every src of the reversed graph has out-weight 1
    val outsums = rev.edges.groupBy(col("src")).agg(sum(col("weight")).as("s"))
      .collect().map(_.getDouble(1))
    outsums.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
    // PageRank over the reversed graph matches the dense oracle on swapped edges
    val idOf = rev.dict.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val revEdges = fwd.rawEdges.collect()
      .map(e => (e.dst.toInt, e.src.toInt, e.weight)).toSeq
    val (expected, _) = DenseOracle.pagerank(idOf.size, revEdges, 0.85, tol = 1e-13)
    val (ranks, _) = graft.graph.PageRank.run(rev,
      graft.model.PageRankConfig(alpha = 0.85, tol = 1e-10))
    val got = ranks.collect().map(x => x.id -> x.rank).toMap
    expected.zipWithIndex.foreach { case (e, i) =>
      assert(math.abs(got(i.toLong) - e) < 1e-8, s"vertex $i") }
  }

  test("hash id dictionary matches dense dictionary modulo renaming") {
    val ds = generate(spark, 100)
    val g1 = GraphOps.fromTranscripts(ds, denseIds = true)
    val g2 = GraphOps.fromTranscripts(ds, denseIds = false)
    assert(g1.numVertices == g2.numVertices)
    assert(g1.numEdges == g2.numEdges)
    // edge multiset is identical after mapping ids back to conv_ids
    def named(g: graft.graph.LinkGraph): Set[(String, String, Double)] = {
      val d = g.dict.collect().map(r => r.getLong(1) -> r.getString(0)).toMap
      g.rawEdges.collect().map(e => (d(e.src), d(e.dst), e.weight)).toSet
    }
    assert(named(g1) == named(g2))
  }
}
