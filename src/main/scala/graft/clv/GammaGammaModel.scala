package graft.clv

import graft.clv.SpecialFunctions._

/** Gamma-Gamma monetary-value model — Fader & Hardie 2013, "The
  * Gamma-Gamma Model of Monetary Value" (ref fit calls
  * DS_cust_lifetime_value.py:297-298, in-UDF :477-478). Assumes spend per
  * transaction ~ Gamma(p, ν) with customer-level heterogeneity
  * ν ~ Gamma(q, γ/v); requires repeat buyers (x ≥ 1) and monetary ⊥
  * frequency (the reference checks corr at DS:287 — our A10 query).
  */
final case class GammaGammaParams(p: Double, q: Double, v: Double) {

  /** Per-customer log-likelihood for (x, m̄x): frequency and observed
    * mean transaction value (Fader/Hardie 2013 eq. (1a) log form). */
  def logLikelihood(x: Double, mx: Double): Double = {
    val px = p * x
    lgamma(px + q) - lgamma(px) - lgamma(q) +
      q * math.log(v) +
      (px - 1) * math.log(mx) +
      px * math.log(x) -
      (px + q) * math.log(v + mx * x)
  }

  /** E(M | p, q, v; m̄x, x) — conditional expected average transaction
    * value (Fader/Hardie 2013 eq. (5); ref usage DS:316-319). */
  def conditionalExpectedAverageProfit(x: Double, mx: Double): Double =
    p * (v + mx * x) / (p * x + q - 1)
}

object GammaGammaModel {

  /** Degenerate fallback when a group has no fit-eligible customers
    * (no repeat buyers with positive spend): p=1, q=2, v=populationMean
    * makes the conditional mean E(M|x,m̄) = (v + x·m̄)/(x+1) — the
    * Bayesian-shrinkage blend of the population mean and the observed
    * mean, which is the sane prior-only prediction. */
  def degenerate(populationMean: Double): GammaGammaParams =
    GammaGammaParams(1.0, 2.0, math.max(populationMean, 1e-9))

  /** MLE over log-params; mean NLL + L2 penalty on natural params
    * (coefficient at ref DS:477 → 0.01). `data` rows: (x, m̄x), repeat
    * buyers only (x ≥ 1, m̄x > 0) — the caller filters (ref DS:276). */
  def fit(data: IndexedSeq[(Double, Double)],
          penalizer: Double = 0.01): GammaGammaParams = {
    require(data.nonEmpty, "Gamma-Gamma fit needs at least one customer")
    val n = data.length.toDouble
    val m = data.length
    val xsA = new Array[Double](m); val mxA = new Array[Double](m)
    val logMx = new Array[Double](m) // log(m̄x) is eval-invariant
    var i0 = 0
    while (i0 < m) {
      val (x, mx) = data(i0); xsA(i0) = x; mxA(i0) = mx
      logMx(i0) = math.log(mx); i0 += 1
    }
    // Frequency takes few distinct values — hoist the two lgamma terms
    // and px·log(x) per distinct x per evaluation (cached values equal
    // the per-row ones and the row summation order is unchanged, so the
    // fit is bit-identical to evaluating logLikelihood per row).
    val distinctX: Array[Double] = xsA.distinct.sorted
    val k = distinctX.length
    val xi = new Array[Int](m)
    var i1 = 0
    while (i1 < m) {
      xi(i1) = java.util.Arrays.binarySearch(distinctX, xsA(i1)); i1 += 1
    }

    def nll(logParams: Array[Double]): Double = {
      val p = math.exp(logParams(0)); val q = math.exp(logParams(1))
      val v = math.exp(logParams(2))
      val lgQ = lgamma(q); val qLogV = q * math.log(v)
      val cLg = new Array[Double](k)  // lgamma(px+q) − lgamma(px)
      val cPx = new Array[Double](k)  // px
      val cPxLogX = new Array[Double](k) // px·log(x)
      var d = 0
      while (d < k) {
        val px = p * distinctX(d)
        cLg(d) = lgamma(px + q) - lgamma(px)
        cPx(d) = px
        cPxLogX(d) = px * math.log(distinctX(d))
        d += 1
      }
      var s = 0.0
      var i = 0
      while (i < m) {
        val j = xi(i); val px = cPx(j)
        // same association order as GammaGammaParams.logLikelihood
        s += cLg(j) - lgQ + qLogV +
          (px - 1) * logMx(i) + cPxLogX(j) -
          (px + q) * math.log(v + mxA(i) * xsA(i))
        i += 1
      }
      val pen = penalizer * (p * p + q * q + v * v)
      -s / n + pen
    }

    val res = NelderMead.minimize(nll, Array(0.1, 0.1, 0.1))
    GammaGammaParams(math.exp(res.x(0)), math.exp(res.x(1)), math.exp(res.x(2)))
  }
}
