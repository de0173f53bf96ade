package graft.linalg

/** Minimal dense linear algebra for the tiny (≤ window-size ×
  * degree+1) design matrices used by windowed Taylor fits. numpy-lstsq
  * compatible: rank-deficient systems get the minimum-norm solution via
  * an SVD pseudoinverse (one-sided Jacobi — simple and robust at these
  * sizes). Runs on the driver once per feature spec; never in the hot
  * path.
  */
object Linalg {

  def transpose(a: Array[Array[Double]]): Array[Array[Double]] = {
    val m = a.length
    val n = if (m == 0) 0 else a(0).length
    Array.tabulate(n, m)((i, j) => a(j)(i))
  }

  def matmul(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] = {
    val m = a.length; val k = if (m == 0) 0 else a(0).length
    val n = if (b.length == 0) 0 else b(0).length
    Array.tabulate(m, n) { (i, j) =>
      var s = 0.0; var t = 0; while (t < k) { s += a(i)(t) * b(t)(j); t += 1 }; s
    }
  }

  /** Moore-Penrose pseudoinverse of an m×n matrix (any shape, any
    * rank). Empty dimensions yield the n×m zero-shaped result, which
    * makes `pinv(X)·y` the all-zeros vector — matching numpy lstsq on
    * a 0-row system (reference edge position 0 with fill_edges).
    */
  def pinv(a: Array[Array[Double]]): Array[Array[Double]] = {
    val m = a.length
    val n = if (m == 0) 0 else a(0).length
    if (m == 0 || n == 0) return Array.fill(n)(new Array[Double](m))
    if (m < n) return transpose(pinv(transpose(a)))

    // one-sided Jacobi: orthogonalize columns of B = A·V
    val b = Array.tabulate(n, m)((j, i) => a(i)(j)) // column-major work copy
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var rotated = true
    var sweep = 0
    while (rotated && sweep < 100) {
      rotated = false; sweep += 1
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) {
          var app = 0.0; var aqq = 0.0; var apq = 0.0
          var i = 0
          while (i < m) {
            app += b(p)(i) * b(p)(i); aqq += b(q)(i) * b(q)(i); apq += b(p)(i) * b(q)(i)
            i += 1
          }
          if (math.abs(apq) > 1e-14 * math.sqrt(app * aqq)) {
            rotated = true
            val zeta = (aqq - app) / (2.0 * apq)
            val t =
              if (zeta >= 0) 1.0 / (zeta + math.sqrt(1.0 + zeta * zeta))
              else -1.0 / (-zeta + math.sqrt(1.0 + zeta * zeta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            i = 0
            while (i < m) {
              val bp = b(p)(i); val bq = b(q)(i)
              b(p)(i) = c * bp - s * bq; b(q)(i) = s * bp + c * bq
              i += 1
            }
            i = 0
            while (i < n) {
              val vp = v(i)(p); val vq = v(i)(q)
              v(i)(p) = c * vp - s * vq; v(i)(q) = s * vp + c * vq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
    }
    val sig = b.map(colB => math.sqrt(colB.map(x => x * x).sum))
    val smax = sig.max
    val tol = 2.220446049250313e-16 * math.max(m, n) * smax
    // pinv(i)(k) = Σ_j V(i,j)·(1/σ_j)·U(k,j), U_j = B_j/σ_j
    Array.tabulate(n, m) { (i, k) =>
      var s = 0.0; var j = 0
      while (j < n) {
        if (sig(j) > tol) s += v(i)(j) * b(j)(k) / (sig(j) * sig(j))
        j += 1
      }
      s
    }
  }
}
