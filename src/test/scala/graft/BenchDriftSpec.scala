package graft

import org.scalatest.funsuite.AnyFunSuite

/** The box-drift detector's contract on synthetic best/floor ratio
  * vectors — the signature the r17 bisect established: a box slowdown is
  * UNIFORM (every query a bit over floor, none suspect), a code regression
  * is CONCENTRATED (a few queries spike, the catalog sits near 1.0).
  */
class BenchDriftSpec extends AnyFunSuite {

  private def uniform(n: Int, r: Double): Seq[Double] = Seq.fill(n)(r)

  test("the r17 signature fires: uniform ~1.32x over a full catalog, zero suspects") {
    // jittered, not constant — real sweeps spread ±10% around the shift
    val ratios = (0 until 235).map(i => 1.32 + 0.1 * math.sin(i.toDouble))
    assert(Bench.boxDriftSuspected(ratios, nSuspect = 0))
  }

  test("a concentrated regression does NOT fire: catalog at 1.0, five queries at 3x") {
    val ratios = uniform(230, 1.02) ++ uniform(5, 3.0)
    assert(!Bench.boxDriftSuspected(ratios, nSuspect = 0))
  }

  test("suspects veto the drift diagnosis — a 2x-gate trip is a named query problem") {
    assert(!Bench.boxDriftSuspected(uniform(235, 1.4), nSuspect = 1))
  }

  test("a mild uniform shift below the 1.25x line does not fire") {
    assert(!Bench.boxDriftSuspected(uniform(235, 1.15), nSuspect = 0))
  }

  test("a small catalog cannot diagnose drift (not statistically meaningful)") {
    assert(!Bench.boxDriftSuspected(uniform(50, 1.5), nSuspect = 0))
  }

  test("a slow MEDIAN dragged by most of the catalog does not fire when a " +
    "quarter sits untouched — p25 must also move for a UNIFORM diagnosis") {
    // 60 untouched at 1.0, 175 at 1.6: median = 1.6 but p25 = 1.0 — broad
    // but not uniform (a shared-fixture regression, not the box)
    val ratios = uniform(60, 1.0) ++ uniform(175, 1.6)
    assert(!Bench.boxDriftSuspected(ratios, nSuspect = 0))
  }
}
