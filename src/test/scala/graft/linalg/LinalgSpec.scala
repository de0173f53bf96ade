package graft.linalg

import org.scalatest.funsuite.AnyFunSuite

class LinalgSpec extends AnyFunSuite {

  private def approxEq(a: Array[Array[Double]], b: Array[Array[Double]], tol: Double = 1e-10): Boolean =
    a.length == b.length && a.zip(b).forall { case (r1, r2) =>
      r1.length == r2.length && r1.zip(r2).forall { case (x, y) => math.abs(x - y) <= tol }
    }

  test("pinv of square invertible = inverse") {
    val a = Array(Array(4.0, 7.0), Array(2.0, 6.0))
    val inv = Array(Array(0.6, -0.7), Array(-0.2, 0.4))
    assert(approxEq(Linalg.pinv(a), inv))
  }

  test("pinv satisfies Moore-Penrose conditions on tall rank-deficient matrix") {
    // second column = 2 * first → rank 1
    val a = Array(Array(1.0, 2.0), Array(2.0, 4.0), Array(3.0, 6.0))
    val p = Linalg.pinv(a)
    val apa = Linalg.matmul(Linalg.matmul(a, p), a)
    val pap = Linalg.matmul(Linalg.matmul(p, a), p)
    assert(approxEq(apa, a))
    assert(approxEq(pap, p))
  }

  test("pinv of underdetermined system gives min-norm lstsq (numpy parity)") {
    // single row [1, 0]: lstsq solution of beta0*1 + beta1*0 = y is (y, 0)
    val p = Linalg.pinv(Array(Array(1.0, 0.0)))
    assert(math.abs(p(0)(0) - 1.0) < 1e-12 && math.abs(p(1)(0)) < 1e-12)
  }

  test("pinv of empty system is zero-shaped (numpy lstsq zeros)") {
    val p = Linalg.pinv(Array.empty[Array[Double]])
    assert(p.isEmpty)
  }
}
