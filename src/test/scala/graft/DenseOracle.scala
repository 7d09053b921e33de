package graft

/** In-repo dense PageRank oracle: a direct transcription of the reference
  * power loop (/root/reference/ppagerank.cc:299-330) onto Array[Double],
  * including the ω = 1 − ‖αPᵀx‖₁ implicit dangling+teleport fold.
  * Used by golden tests; NOT part of the engine.
  */
object DenseOracle {

  /** @param edges raw (src, dst, weight-multiplicity); duplicates summed.
    * @param v personalization vector (default uniform 1/n); x₀ = v and the
    *          ω dangling+teleport mass is redistributed along v, exactly as
    *          the reference threads Vec v (ppagerank.cc:91-104, 311-315).
    */
  def pagerank(n: Int, edges: Seq[(Int, Int, Double)], alpha: Double,
      tol: Double = 1e-12, maxIter: Int = 10000,
      v: Option[Array[Double]] = None): (Array[Double], Int) = {
    val agg = scala.collection.mutable.Map[(Int, Int), Double]()
    edges.foreach { case (s, d, w) => agg((s, d)) = agg.getOrElse((s, d), 0.0) + w }
    val outsum = new Array[Double](n)
    agg.foreach { case ((s, _), w) => outsum(s) += w }
    val vv = v.getOrElse(Array.fill(n)(1.0 / n))

    var x = vv.clone()
    var iter = 0
    var delta = Double.MaxValue
    while (iter < maxIter && delta >= tol) {
      val y = new Array[Double](n)
      agg.foreach { case ((s, d), w) =>
        if (outsum(s) > 0) y(d) += alpha * (w / outsum(s)) * x(s)
      }
      val omega = 1.0 - y.sum
      var i = 0
      delta = 0.0
      while (i < n) {
        y(i) += omega * vv(i)
        delta += math.abs(y(i) - x(i))
        i += 1
      }
      x = y
      iter += 1
    }
    (x, iter)
  }

  /** Exact connected components by union-find (undirected). */
  def components(n: Int, edges: Seq[(Int, Int)]): Array[Int] = {
    val parent = Array.tabulate(n)(identity)
    def find(a: Int): Int = { var r = a; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (s, d) =>
      val (rs, rd) = (find(s), find(d))
      if (rs != rd) parent(math.max(rs, rd)) = math.min(rs, rd)
    }
    Array.tabulate(n)(i => find(i))
  }

  /** Brute-force O(n³) triangle count on the undirected simple graph. */
  def triangles(n: Int, edges: Seq[(Int, Int)]): Long = {
    val adj = Array.fill(n, n)(false)
    edges.foreach { case (s, d) =>
      if (s != d) { adj(s)(d) = true; adj(d)(s) = true }
    }
    var c = 0L
    for (a <- 0 until n; b <- a + 1 until n if adj(a)(b);
         cc <- b + 1 until n if adj(a)(cc) && adj(b)(cc)) c += 1
    c
  }

  /** Synchronous min-tiebreak label propagation (LabelPropagation semantics). */
  def labelProp(n: Int, edges: Seq[(Int, Int)], rounds: Int): Array[Int] = {
    val in = edges.distinct.groupBy(_._2).map { case (d, es) => d -> es.map(_._1).distinct }
    var labels = Array.tabulate(n)(identity)
    for (_ <- 0 until rounds) {
      val next = labels.clone()
      in.foreach { case (v, srcs) =>
        val counts = srcs.map(labels).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        // max count, tie → min label
        next(v) = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
      labels = next
    }
    labels
  }
}
