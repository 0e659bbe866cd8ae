package graft.vector

/** Driver-side symmetric eigendecomposition for the distributed PCA
  * operator (q248): the SCATTER matrix is computed distributed and
  * exactly (DECIMAL-quantized outer products — order-insensitive, so
  * bit-identical under any partitioning), collected as d² ≪ data
  * values, and decomposed here with cyclic Jacobi — the classic
  * fit-small/score-wide split (the same shape as the CLV MLE fit and
  * the k-means coarse quantizer: heavy data pass distributed, tiny
  * deterministic solve on the driver).
  *
  * Cyclic Jacobi with a fixed sweep cap and fixed pivot order is
  * bit-deterministic for a given input matrix; eigenvectors are
  * sign-normalized (largest-|component| entry positive, ties to the
  * lower index) so the full decomposition is reproducible. */
object Pca {

  /** Eigen-decompose a symmetric matrix. Returns (eigenvalues,
    * eigenvectors) sorted by descending eigenvalue; eigenvectors are
    * rows of the second array, sign-normalized. */
  def jacobiEigen(a0: Array[Array[Double]],
                  sweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    require(a0.forall(_.length == n), "matrix must be square")
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < sweeps && off > 1e-14) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18) {
            // standard Jacobi rotation annihilating a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // t = sign(θ)/(|θ|+√(θ²+1)); θ = 0 → t = 1 (45° rotation)
            val sign = if (theta >= 0) 1.0 else -1.0
            val t = sign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    // sort by descending eigenvalue (ties by original index), rows =
    // eigenvectors, sign-normalized for reproducibility
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val col = Array.tabulate(n)(k => v(k)(i))
      val m = col.indices.maxBy(k => (math.abs(col(k)), -k))
      if (col(m) < 0) col.map(x => -x) else col
    }.toArray
    (values, vectors)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** max |M·v − λv| over all eigenpairs, relative to the largest
    * eigenvalue — the correctness residual q248 gates on. */
  def eigenResidual(m: Array[Array[Double]], values: Array[Double],
                    vectors: Array[Array[Double]]): Double = {
    val n = m.length
    val scale = math.max(1e-30, values.map(math.abs).max)
    var worst = 0.0
    var e = 0
    while (e < n) {
      val vec = vectors(e)
      var i = 0
      while (i < n) {
        var mv = 0.0
        var j = 0
        while (j < n) { mv += m(i)(j) * vec(j); j += 1 }
        worst = math.max(worst, math.abs(mv - values(e) * vec(i)))
        i += 1
      }
      e += 1
    }
    worst / scale
  }

  /** max |VᵀV − I| — the orthonormality defect q248 gates on. */
  def orthonormalDefect(vectors: Array[Array[Double]]): Double = {
    val n = vectors.length
    var worst = 0.0
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        var dot = 0.0
        var k = 0
        while (k < n) { dot += vectors(i)(k) * vectors(j)(k); k += 1 }
        worst = math.max(worst,
          math.abs(dot - (if (i == j) 1.0 else 0.0)))
        j += 1
      }
      i += 1
    }
    worst
  }
}
