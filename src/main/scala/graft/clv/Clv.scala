package graft.clv

/** Discounted customer-lifetime-value combining the two fitted models
  * (ref DS_cust_lifetime_value.py:305-314 driver-side, :480-489 in-UDF):
  * monthly steps over a horizon, each month's expected incremental
  * repeat purchases (BG/NBD) × expected average profit (Gamma-Gamma),
  * discounted at rate d per month. Frequency unit is weeks
  * (`freq='W'` in the reference call), so each month advances the
  * purchase clock by WeeksPerMonth.
  */
object Clv {

  /** Weeks per month used to convert monthly steps to the weekly
    * purchase-model clock (365.25 / 12 / 7). */
  val WeeksPerMonth: Double = 4.345

  /** @param months   horizon in months (ref: time=12)
    * @param discount monthly discount rate (ref in-UDF: 0.01)
    */
  def customerLifetimeValue(
      bg: BetaGeoParams,
      expectedAvgProfit: Double,
      x: Double, tx: Double, bigT: Double,
      months: Int = 12,
      discount: Double = 0.01): Double = {
    var clv = 0.0
    var prev = 0.0
    var i = 1
    while (i <= months) {
      val cum = bg.conditionalExpectedPurchases(i * WeeksPerMonth, x, tx, bigT)
      clv += expectedAvgProfit * (cum - prev) / math.pow(1.0 + discount, i)
      prev = cum
      i += 1
    }
    clv
  }
}
