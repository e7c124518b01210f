package graft.functions

/** Driver-side principal-component extraction from the q166 covariance
  * matrix — the same division of labor as the k-means / PQ codebook fits:
  * the CLUSTER does the one corpus-scale pass (the exact integer
  * covariance aggregation), the driver does the O(dim²·iters) model fit
  * on the dim×dim result, and whatever it learns broadcasts back into
  * projection expressions. At dim = 64 the fit is microseconds; even at
  * dim = 4096 it is a few ms — never a distributed job.
  */
object Pca {

  /** Power iteration on a symmetric matrix given as upper-triangle entries
    * (p ≤ q). Deterministic: starts from an index-graded perturbation of
    * the all-ones direction — a FLAT start can be exactly orthogonal to
    * the dominant eigenvector (e.g. any eigenvector summing to zero),
    * which silently converges to a subdominant pair; the graded start
    * breaks that orthogonality for all but adversarially-tuned matrices
    * while staying fully replayable. Normalizes each step, converges
    * geometrically when the dominant eigenvalue is separated, and
    * early-exits once the direction moves less than `tol` per step
    * (sign-insensitive, so a dominant NEGATIVE eigenvalue's alternating
    * iterate also terminates). Returns (eigenvector, eigenvalue) with the
    * Rayleigh quotient as the eigenvalue estimate.
    */
  def topComponent(upper: Seq[(Int, Int, Double)], dim: Int,
                   iters: Int = 100, tol: Double = 1e-12): (Array[Double], Double) = {
    val m = Array.ofDim[Double](dim, dim)
    upper.foreach { case (p, q, v) => m(p)(q) = v; m(q)(p) = v }
    var v = Array.tabulate(dim)(i => 1.0 + (i + 1) * 1e-3)
    locally {
      val n0 = math.sqrt(v.map(x => x * x).sum)
      v = v.map(_ / n0)
    }
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => m(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      if (norm == 0.0) converged = true // v in the null space; keep it
      else {
        val u = w.map(_ / norm)
        val dPlus = (0 until dim).map(i => (u(i) - v(i)) * (u(i) - v(i))).sum
        val dMinus = (0 until dim).map(i => (u(i) + v(i)) * (u(i) + v(i))).sum
        converged = math.sqrt(math.min(dPlus, dMinus)) < tol
        v = u
      }
      it += 1
    }
    val av = Array.tabulate(dim)(i => (0 until dim).map(j => m(i)(j) * v(j)).sum)
    ((v, (0 until dim).map(i => v(i) * av(i)).sum))
  }
}
