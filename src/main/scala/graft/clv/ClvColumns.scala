package graft.clv

import graft.functions.Hyp2F1Expr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CLV closed forms as *Column expressions* — the 100 TB scoring
  * architecture: fit the handful of model parameters on the summarized
  * frame (small), then score every customer with pure expression
  * arithmetic that runs inside whole-stage codegen. No per-row closure,
  * no shuffle beyond the input's own partitioning. probAlive,
  * expectedPurchases and expectedAvgProfit are bit-identical to the JVM
  * pipeline math (same formulas, same ₂F₁ implementation); clv() uses a
  * telescoped-weight regrouping of the discounted sum that is
  * algebraically equal but rounds differently in the last ulps
  * (ClvSpec bounds the difference at 1e-7).
  *
  * Inputs are column names for (frequency x, recency t_x, age T).
  */
object ClvColumns {

  /** P(alive | x, t_x, T) (ref DS:240; x=0 → 1 per ref UDF :491-492). */
  def probAlive(p: BetaGeoParams, x: Column, tx: Column, t: Column): Column =
    when(x <= 0, lit(1.0)).otherwise(
      lit(1.0) / (lit(1.0) + exp(
        log(lit(p.a)) - log(lit(p.b) + x - 1) +
          (lit(p.r) + x) * (log(lit(p.alpha) + t) - log(lit(p.alpha) + tx)))))

  /** E[Y(horizon) | x, t_x, T] (ref DS:213; Fader/Hardie 2005 eq. 10). */
  def expectedPurchases(p: BetaGeoParams, horizon: Double,
                        x: Column, tx: Column, t: Column): Column = {
    val rx = lit(p.r) + x
    val z = lit(horizon) / (lit(p.alpha) + t + horizon)
    val hyp = Hyp2F1Expr(rx, lit(p.b) + x,
      lit(p.a) + lit(p.b) + x - 1, z)
    val num = (lit(p.a) + lit(p.b) + x - 1) / lit(p.a - 1) *
      (lit(1.0) - pow((lit(p.alpha) + t) / (lit(p.alpha) + t + horizon), rx) * hyp)
    val den = when(x > 0,
      lit(1.0) + lit(p.a) / (lit(p.b) + x - 1) *
        pow((lit(p.alpha) + t) / (lit(p.alpha) + tx), rx))
      .otherwise(lit(1.0))
    num / den
  }

  /** [[probAlive]] with the fitted parameters as COLUMNS — for scoring
    * rows against per-group fits joined back onto them (q82's gate),
    * where the params vary row to row and can't be `lit`ed. */
  def probAliveP(r: Column, alpha: Column, a: Column, b: Column,
                 x: Column, tx: Column, t: Column): Column =
    when(x <= 0, lit(1.0)).otherwise(
      lit(1.0) / (lit(1.0) + exp(
        log(a) - log(b + x - 1) +
          (r + x) * (log(alpha + t) - log(alpha + tx)))))

  /** [[expectedPurchases]] with parameters as COLUMNS (see
    * [[probAliveP]]); same formula, same ₂F₁ expression. */
  def expectedPurchasesP(r: Column, alpha: Column, a: Column, b: Column,
                         horizon: Column,
                         x: Column, tx: Column, t: Column): Column = {
    val rx = r + x
    val z = horizon / (alpha + t + horizon)
    val hyp = Hyp2F1Expr(rx, b + x, a + b + x - 1, z)
    val num = (a + b + x - 1) / (a - 1) *
      (lit(1.0) - pow((alpha + t) / (alpha + t + horizon), rx) * hyp)
    val den = when(x > 0,
      lit(1.0) + a / (b + x - 1) * pow((alpha + t) / (alpha + tx), rx))
      .otherwise(lit(1.0))
    num / den
  }

  /** E(M | x, m̄x) (ref DS:316-319; Fader/Hardie 2013 eq. 5). */
  def expectedAvgProfit(g: GammaGammaParams, x: Column, mx: Column): Column =
    lit(g.p) * (lit(g.v) + mx * x) / (lit(g.p) * x + lit(g.q) - 1)

  /** Monthly-discounted CLV on the weekly clock (ref DS:305-314),
    * unrolled as expression arithmetic over the horizon months. */
  def clv(p: BetaGeoParams, g: GammaGammaParams,
          x: Column, tx: Column, t: Column, mx: Column,
          months: Int = 12, discount: Double = 0.01): Column = {
    val profit = expectedAvgProfit(g, x, mx)
    // E[Y] is cumulative: month i's increment telescopes as cum_i −
    // cum_{i−1}. Regrouping the discounted sum as Σ cum_i·w_i with
    // w_i = 1/(1+d)^i − 1/(1+d)^{i+1} (and w_months = 1/(1+d)^months)
    // evaluates each cum_i ONCE — halves the ₂F₁ calls per row.
    val terms = (1 to months).map { i =>
      val cum = expectedPurchases(p, i * Clv.WeeksPerMonth, x, tx, t)
      val w =
        if (i == months) 1.0 / math.pow(1.0 + discount, i)
        else 1.0 / math.pow(1.0 + discount, i) -
          1.0 / math.pow(1.0 + discount, i + 1)
      cum * lit(w)
    }
    profit * terms.reduce(_ + _)
  }

  /** Score a summarized frame with fitted params: adds the four
    * prediction columns in one codegen'd projection. */
  def scoreAll(rfm: DataFrame, p: BetaGeoParams, g: GammaGammaParams,
               horizon: Double = ClvPipeline.HorizonWeeks): DataFrame = {
    val x = col("frequency"); val tx = col("recency")
    val t = col("t_weeks"); val m = col("avg_monetary")
    rfm
      .withColumn("pred_visits", expectedPurchases(p, horizon, x, tx, t))
      .withColumn("prob_alive", probAlive(p, x, tx, t))
      .withColumn("cond_exp_avg_profit", expectedAvgProfit(g, x, m))
      .withColumn("pred_clv", clv(p, g, x, tx, t, m))
  }
}
