package graft

import graft.functions.Pca
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("power iteration recovers known eigenpairs") {
    // diag(5, 1): top direction is e1 with eigenvalue 5
    val (v1, l1) = Pca.topComponent(Seq((0, 0, 5.0), (1, 1, 1.0)), dim = 2)
    assert(math.abs(l1 - 5.0) < 1e-9)
    assert(math.abs(math.abs(v1(0)) - 1.0) < 1e-9 && math.abs(v1(1)) < 1e-9)
    // [[2,1],[1,2]]: eigenvalues 3 and 1, top direction (1,1)/sqrt(2)
    val (v2, l2) = Pca.topComponent(Seq((0, 0, 2.0), (0, 1, 1.0), (1, 1, 2.0)), dim = 2)
    assert(math.abs(l2 - 3.0) < 1e-9)
    assert(math.abs(v2(0) - v2(1)) < 1e-9)
  }

  test("orthogonal-start matrix still recovers the dominant eigenpair") {
    // [[1,-2],[-2,1]]: eigenpairs 3 @ (1,-1)/sqrt2 and -1 @ (1,1)/sqrt2.
    // The dominant eigenvector sums to zero, so a FLAT all-ones start is
    // EXACTLY orthogonal to it and a naive power iteration returns the
    // subdominant -1 — the graded start must break the orthogonality.
    val (v, l) = Pca.topComponent(Seq((0, 0, 1.0), (0, 1, -2.0), (1, 1, 1.0)), dim = 2)
    assert(math.abs(l - 3.0) < 1e-9, s"got eigenvalue $l")
    assert(math.abs(v(0) + v(1)) < 1e-9, s"direction ${v.toSeq}")
    // early-exit: a diagonal matrix converges in a handful of steps, so a
    // huge iteration budget must return identically (and instantly)
    val (vFast, lFast) = Pca.topComponent(Seq((0, 0, 5.0), (1, 1, 1.0)),
      dim = 2, iters = 100000000)
    assert(math.abs(lFast - 5.0) < 1e-9)
    assert(math.abs(math.abs(vFast(0)) - 1.0) < 1e-9)
  }

  test("q166 covariance feeds the driver-side fit: Rayleigh quotient dominates every diagonal") {
    val rows = SparkEntry.queries("q166_dim_covariance")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toDouble))
    assert(rows.length == 64 * 65 / 2, "upper triangle incl. diagonal")
    val diag = rows.filter(r => r._1 == r._2).map(_._3)
    assert(diag.length == 64 && diag.forall(_ >= 0.0), "variances are non-negative")
    // covariance bound: |cov|^2 <= var_p * var_q, with one-unit DIV slack
    val vars = rows.filter(r => r._1 == r._2).map(r => r._1 -> r._3).toMap
    rows.filter(r => r._1 != r._2).foreach { case (p, q, c) =>
      assert((math.abs(c) - 1) * (math.abs(c) - 1) <= (vars(p) + 1) * (vars(q) + 1),
        s"($p,$q): covariance $c exceeds the Cauchy-Schwarz bound")
    }
    val (_, lambda) = Pca.topComponent(rows.toSeq, dim = 64)
    assert(lambda >= diag.max - 1e-6,
      s"top eigenvalue $lambda below max variance ${diag.max}")
  }
}
