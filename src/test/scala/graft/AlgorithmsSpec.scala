package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{ConnectedComponents, LabelPropagation, Triangles}

class AlgorithmsSpec extends AnyFunSuite with SparkTestBase {

  for ((name, (n, edges)) <- GraphFixtures.all) {
    test(s"connected components exact on $name") {
      val g = GraphFixtures.linkGraph(spark, n, edges)
      val got = ConnectedComponents.run(g.edges, g.vertices)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = DenseOracle.components(n, edges.map(e => (e._1, e._2)))
      (0 until n).foreach(i => assert(got(i.toLong) == expected(i).toLong,
        s"$name vertex $i: got ${got(i.toLong)}, expected ${expected(i)}"))
    }

    test(s"triangle count matches brute force on $name") {
      val g = GraphFixtures.linkGraph(spark, n, edges)
      assert(Triangles.count(g.edges) ==
        DenseOracle.triangles(n, edges.map(e => (e._1, e._2))))
    }

    test(s"per-vertex triangle counts match brute force on $name") {
      val g = GraphFixtures.linkGraph(spark, n, edges)
      val got = Triangles.perVertex(g.edges, g.vertices)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force: count triples over the undirected simple graph
      val und = edges.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
        .filter(p => p._1 != p._2).toSet
      val exp = Array.fill(n)(0L)
      for (a <- 0 until n; b <- a + 1 until n if und((a, b));
           c <- b + 1 until n if und((a, c)) && und((b, c))) {
        exp(a) += 1; exp(b) += 1; exp(c) += 1
      }
      (0 until n).foreach(i => assert(got(i.toLong) == exp(i),
        s"$name vertex $i: got ${got(i.toLong)}, expected ${exp(i)}"))
    }

    test(s"label propagation matches dense oracle on $name") {
      val g = GraphFixtures.linkGraph(spark, n, edges)
      val got = LabelPropagation.run(g.edges, g.vertices, rounds = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = DenseOracle.labelProp(n, edges.map(e => (e._1, e._2)), 4)
      (0 until n).foreach(i => assert(got(i.toLong) == expected(i).toLong,
        s"$name vertex $i: got ${got(i.toLong)}, expected ${expected(i)}"))
    }
  }

  test("CC idempotence: running on an already-labeled graph is stable") {
    val (n, edges) = GraphFixtures.g3
    val g = GraphFixtures.linkGraph(spark, n, edges)
    val l1 = ConnectedComponents.run(g.edges, g.vertices)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val l2 = ConnectedComponents.run(g.edges, g.vertices)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l1 == l2)
  }

  test("label propagation exits early at the fixpoint, result matches the full run") {
    // directed chain 0→1→2: labels converge to all-0 in 2 rounds, round 3
    // observes zero changes — a 50-round request must stop right there and
    // still equal the dense oracle's full 50 rounds (fixpoint ⇒ identical)
    import spark.implicits._
    val edges = Seq((0, 1, 1.0), (1, 2, 1.0))
    val g = GraphFixtures.linkGraph(spark, 3, edges)
    val before = spark.sparkContext.getPersistentRDDs.size
    val (labels, executed) = LabelPropagation.runWithStats(g.edges, g.vertices, rounds = 50)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(executed <= 4, s"no early exit: ran $executed rounds")
    val exp = DenseOracle.labelProp(3, edges.map(e => (e._1, e._2)), 50)
    (0 until 3).foreach(i => assert(got(i.toLong) == exp(i).toLong))
    // only the returned labels frame may stay cached — superseded rounds'
    // blocks are unpersisted deterministically, not left to the cleaner
    assert(after - before <= 1, s"cached blocks grew $before -> $after")
  }

  test("triangle count = 4 on K4 + pendant (G4)") {
    val (n, edges) = GraphFixtures.g4
    val g = GraphFixtures.linkGraph(spark, n, edges)
    assert(Triangles.count(g.edges) == 4L)
    val per = Triangles.perVertex(g.edges, g.vertices)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each K4 vertex is in C(3,2)=3 triangles; pendant in 0
    assert(per == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 0L))
  }
}
