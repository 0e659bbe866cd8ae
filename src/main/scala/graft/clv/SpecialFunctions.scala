package graft.clv

import org.apache.commons.math3.special.Gamma

/** Special functions for the CLV closed forms (SURVEY.md §2.11 U2):
  * log-gamma (commons-math3, on Spark's classpath) and the Gaussian
  * hypergeometric ₂F₁ needed by the BG/NBD conditional-expectation
  * formula (Fader/Hardie 2005, cited at ref DS_cust_lifetime_value.py:187).
  */
object SpecialFunctions {

  @inline def lgamma(x: Double): Double = Gamma.logGamma(x)

  /** Gaussian hypergeometric ₂F₁(a, b; c; z) by power series, valid for
    * |z| < 1 (the BG/NBD usage has z = t/(α+T+t) ∈ [0, 1) and converges
    * in a few dozen terms for realistic horizons). Euler's transformation
    * is applied for z > 0.75 to accelerate near-unit arguments:
    * ₂F₁(a,b;c;z) = (1-z)^(c-a-b) ₂F₁(c-a, c-b; c; z). */
  def hyp2f1(a: Double, b: Double, c: Double, z: Double): Double = {
    require(z < 1.0 && z > -1.0, s"hyp2f1 series needs |z|<1, got $z")
    if (z > 0.75) {
      math.pow(1 - z, c - a - b) * series(c - a, c - b, c, z)
    } else series(a, b, c, z)
  }

  private def series(a: Double, b: Double, c: Double, z: Double): Double = {
    var term = 1.0
    var sum = 1.0
    var n = 0
    while (n < 1000 && math.abs(term) > 1e-14 * math.abs(sum)) {
      term *= (a + n) * (b + n) / (c + n) * z / (n + 1)
      sum += term
      n += 1
    }
    sum
  }

  /** log(exp(x) + exp(y)) without overflow. */
  @inline def logSumExp(x: Double, y: Double): Double = {
    val m = math.max(x, y)
    if (m == Double.NegativeInfinity) Double.NegativeInfinity
    else m + math.log(math.exp(x - m) + math.exp(y - m))
  }
}
