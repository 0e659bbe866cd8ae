package graft.clv

/** Deterministic Nelder–Mead simplex minimizer (no randomness: fixed
  * initial-simplex construction, stable tie-breaking sort). Used for the
  * CLV maximum-likelihood fits (ref DS_cust_lifetime_value.py:192,297 —
  * the `lifetimes` library fits BG/NBD and Gamma-Gamma with scipy's
  * Nelder-Mead; this is an independent textbook implementation of the
  * same published algorithm, Nelder & Mead 1965).
  *
  * Determinism matters here: the fit runs inside `flatMapGroups` on
  * executors and its output feeds hash-compared query results, so the
  * same group content must always produce bit-identical parameters.
  */
object NelderMead {

  final case class Result(x: Array[Double], f: Double, iters: Int)

  def minimize(
      f: Array[Double] => Double,
      x0: Array[Double],
      maxIter: Int = 2000,
      fTol: Double = 1e-9,
      xTol: Double = 1e-8): Result = {
    val n = x0.length
    val alpha = 1.0; val gamma = 2.0; val rho = 0.5; val sigma = 0.5

    // Initial simplex: x0 plus one vertex per dimension, scaled step
    // (same construction scipy uses: 5% bump, 0.00025 if coordinate is 0).
    val simplex = Array.tabulate(n + 1) { i =>
      val v = x0.clone()
      if (i > 0) {
        val j = i - 1
        v(j) = if (v(j) != 0.0) v(j) * 1.05 else 0.00025
      }
      v
    }
    val fv = simplex.map(f)

    var iter = 0
    while (iter < maxIter) {
      // sort vertices by f, ties by index (stable)
      val order = fv.indices.sortBy(fv)
      val s2 = order.map(simplex).toArray
      val f2 = order.map(fv).toArray
      Array.copy(s2, 0, simplex, 0, n + 1)
      Array.copy(f2, 0, fv, 0, n + 1)

      val fSpread = math.abs(fv(n) - fv(0))
      val xSpread = (0 until n).map { j =>
        (1 to n).map(i => math.abs(simplex(i)(j) - simplex(0)(j))).max
      }.max
      if (fSpread <= fTol && xSpread <= xTol) {
        return Result(simplex(0), fv(0), iter)
      }

      // centroid of best n
      val c = new Array[Double](n)
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) { c(j) += simplex(i)(j) / n; j += 1 }
        i += 1
      }

      def combine(w: Double): Array[Double] =
        Array.tabulate(n)(j => c(j) + w * (c(j) - simplex(n)(j)))

      val xr = combine(alpha); val fr = f(xr)
      if (fr < fv(0)) {
        val xe = combine(gamma); val fe = f(xe)
        if (fe < fr) { simplex(n) = xe; fv(n) = fe }
        else { simplex(n) = xr; fv(n) = fr }
      } else if (fr < fv(n - 1)) {
        simplex(n) = xr; fv(n) = fr
      } else {
        val xc = if (fr < fv(n)) combine(rho) else combine(-rho)
        val fc = f(xc)
        if (fc < math.min(fr, fv(n))) { simplex(n) = xc; fv(n) = fc }
        else {
          // shrink toward best
          var k = 1
          while (k <= n) {
            var j = 0
            while (j < n) {
              simplex(k)(j) = simplex(0)(j) + sigma * (simplex(k)(j) - simplex(0)(j))
              j += 1
            }
            fv(k) = f(simplex(k))
            k += 1
          }
        }
      }
      iter += 1
    }
    val best = fv.indices.minBy(fv)
    Result(simplex(best), fv(best), iter)
  }
}
