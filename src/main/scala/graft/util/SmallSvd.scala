package graft.util

/** One-sided Jacobi SVD for tiny dense matrices (the (k+1)×k Arnoldi H with
  * k = 8) — replaces LAPACK `gesvd` (/root/reference/ppagerank.cc:596-643),
  * which is not available offline. Standard algorithm (Golub & Van Loan §8.6,
  * Demmel & Veselić 1992): orthogonalize column pairs by Jacobi rotations;
  * accumulated rotations form V, column norms the singular values.
  */
object SmallSvd {

  /** @param a row-major m×n matrix (m ≥ n), NOT mutated.
    * @return (sigmas descending, V n×n row-major: column j = right singular
    *         vector of sigma j)
    */
  def svd(a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val m = a.length
    val n = a(0).length
    require(m >= n, s"need m >= n, got ${m}x$n")
    // working copy W (columns get rotated), V starts as identity
    val w = Array.tabulate(m, n)((i, j) => a(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

    val eps = 1e-15
    var rotated = true
    var sweep = 0
    while (rotated && sweep < 60) {
      rotated = false
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          var app = 0.0; var aqq = 0.0; var apq = 0.0
          var i = 0
          while (i < m) {
            app += w(i)(p) * w(i)(p)
            aqq += w(i)(q) * w(i)(q)
            apq += w(i)(p) * w(i)(q)
            i += 1
          }
          if (math.abs(apq) > eps * math.sqrt(app * aqq) && math.abs(apq) > 1e-300) {
            rotated = true
            val tau = (aqq - app) / (2.0 * apq)
            val t = math.signum(tau) / (math.abs(tau) + math.sqrt(1.0 + tau * tau))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            i = 0
            while (i < m) {
              val wp = w(i)(p); val wq = w(i)(q)
              w(i)(p) = c * wp - s * wq
              w(i)(q) = s * wp + c * wq
              i += 1
            }
            i = 0
            while (i < n) {
              val vp = v(i)(p); val vq = v(i)(q)
              v(i)(p) = c * vp - s * vq
              v(i)(q) = s * vp + c * vq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // singular values = column norms; sort descending, permute V columns
    val sig = Array.tabulate(n) { j =>
      var s = 0.0
      var i = 0
      while (i < m) { s += w(i)(j) * w(i)(j); i += 1 }
      (math.sqrt(s), j)
    }
    val order = sig.sortBy(-_._1)
    val sigmas = order.map(_._1)
    val vSorted = Array.tabulate(n, n)((i, j) => v(i)(order(j)._2))
    (sigmas, vSorted)
  }
}
