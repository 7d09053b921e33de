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
