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
    * (p ≤ q). Deterministic: starts from the all-ones direction,
    * normalizes each step, converges geometrically to the top eigenvector
    * for any symmetric matrix whose dominant eigenvalue is separated.
    * Returns (eigenvector, eigenvalue) with the Rayleigh quotient as the
    * eigenvalue estimate.
    */
  def topComponent(upper: Seq[(Int, Int, Double)], dim: Int,
                   iters: Int = 100): (Array[Double], Double) = {
    val m = Array.ofDim[Double](dim, dim)
    upper.foreach { case (p, q, v) => m(p)(q) = v; m(q)(p) = v }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => m(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      if (norm > 0) v = w.map(_ / norm)
    }
    val av = Array.tabulate(dim)(i => (0 until dim).map(j => m(i)(j) * v(j)).sum)
    ((v, (0 until dim).map(i => v(i) * av(i)).sum))
  }
}
