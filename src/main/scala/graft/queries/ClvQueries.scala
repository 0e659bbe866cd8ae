package graft.queries

import graft.clv.ClvPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLV query surface (SURVEY.md §2.11 — the reference's modeling core).
  * These depend on MLE fits, so they are not SQL-expressible and carry no
  * DuckDB oracle (rows-only checks); correctness is covered by golden and
  * property tests in ClvSpec plus the Summary_2011 replay.
  */
object ClvQueries {

  /** The `ltv_results` table (ref DS:352-354): distributed grouped fit,
    * one row per customer, ordered for determinism. */
  def clvResults(s: SparkSession, dir: String): DataFrame =
    ClvPipeline.run(s, dir).toDF().orderBy(col("custkey"))

  /** Segmentation over predicted visits (ref DS:371-383 CASE bucketing on
    * PRED_VISITS feeding the dashboard). */
  def clvSegments(s: SparkSession, dir: String): DataFrame =
    ClvPipeline.run(s, dir).toDF()
      .withColumn("visit_band",
        when(col("pred_visits") >= 8, "1_high")
          .when(col("pred_visits") >= 4, "2_mid")
          .when(col("pred_visits") >= 2, "3_low")
          .otherwise("4_minimal"))
      .groupBy(col("visit_band"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("pred_clv")), 2).as("total_pred_clv"))
      .orderBy(col("visit_band"))

  /** Per-group fitted BG/NBD parameters via the SQL aggregate form
    * (U9 — `fit_bgnbd` as a TypedImperativeAggregate in a GROUP BY). */
  def groupModelParams(s: SparkSession, dir: String): DataFrame =
    ClvPipeline.rfm(s, dir, nGroups = 20).toDF()
      .groupBy(col("group_key"))
      .agg(graft.functions.BetaGeoFitAgg.fitBgnbd(
        col("frequency"), col("recency"), col("t_weeks")).as("params"))
      .select(col("group_key"),
        round(col("params.r"), 6).as("r"),
        round(col("params.alpha"), 6).as("alpha"),
        round(col("params.a"), 6).as("a"),
        round(col("params.b"), 6).as("b"))
      .orderBy(col("group_key"))

  /** The fit-small / score-wide architecture (100 TB shape): fit the two
    * models once on the collected *summarized* frame (one row per
    * customer — at real scale, a sample), then score every customer with
    * pure Column expressions inside whole-stage codegen
    * ([[graft.clv.ClvColumns]]; proven bit-faithful to the JVM math). */
  def clvScoredColumns(s: SparkSession, dir: String): DataFrame = {
    import graft.clv._
    // cached: the summarized frame feeds both the fit-sample collect and
    // the full scoring pass — one aggregation instead of two
    val rfm = ClvPipeline.rfm(s, dir, nGroups = 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fit on a bounded deterministic sample (first 4000 customers by
    // key) — parameter estimates stabilize long before that; scoring
    // still covers every row
    val local = rfm.orderBy(col("custkey")).limit(4000)
      .collect().toIndexedSeq.sortBy(_.custkey)
    val bg = BetaGeoModel.fit(local.map(r => (r.frequency, r.recency, r.t_weeks)))
    val repeat = local.filter(r => r.frequency > 1 && r.avg_monetary > 0)
    val gg =
      if (repeat.nonEmpty)
        GammaGammaModel.fit(repeat.map(r => (r.frequency, r.avg_monetary)))
      else {
        val pos = local.map(_.avg_monetary).filter(_ > 0)
        GammaGammaModel.degenerate(
          if (pos.nonEmpty) pos.sum / pos.length else 1.0)
      }
    ClvColumns.scoreAll(rfm.toDF(), bg, gg)
      .select(col("custkey"), col("frequency"),
        round(col("pred_visits"), 6).as("pred_visits"),
        round(col("prob_alive"), 6).as("prob_alive"),
        round(col("cond_exp_avg_profit"), 4).as("cond_exp_avg_profit"),
        round(col("pred_clv"), 4).as("pred_clv"))
      .orderBy(col("custkey"))
  }

  /** Holdout validation gate (q84/q85 pattern — the oracle-checkable form
    * of the MLE surface): fit BG/NBD on orders BEFORE 2000-01-01, predict
    * each calibration customer's visit count over the 83-week holdout,
    * and compare against the actual holdout orders. The SQL-knowable
    * facts (customer count, actual holdout total) are stated exactly by
    * the oracle; model quality collapses to boolean gates that a broken
    * fit would blow: aggregate prediction within ±2× of actual, mean
    * absolute error under 3 visits (the Poisson noise floor here is
    * ~1.2), and probabilities/predictions inside their domains. The fit
    * sample is bounded and key-ordered, so every value is deterministic.
    *
    * Scale note: the only O(n) driver transfer is the bounded 4000-row
    * fit sample; scoring and the holdout join are codegen'd frame ops. */
  def clvHoldoutValidation(s: SparkSession, dir: String): DataFrame = {
    import graft.clv._
    import s.implicits._
    val Cutoff = "2000-01-01"
    // observation end of the calibration window, same convention as
    // RefQueries.EndWeek (= last observed week + 1 on the 1995-01-01
    // weekly clock); holdout horizon = the remaining observed weeks
    val CalibEndWeek = 261L
    val horizon = (graft.queries.RefQueries.EndWeek - CalibEndWeek).toDouble
    val orders = graft.Tables.load(s, dir, "orders")
    val wk = floor(
      datediff(to_date(col("o_orderdate")), lit("1995-01-01")) / 7).cast("long")
    val calib = orders.filter(to_date(col("o_orderdate")) < lit(Cutoff))
      .groupBy(col("o_custkey"))
      .agg(
        (count(lit(1)) - 1).cast("double").as("frequency"),
        (max(wk) - min(wk)).cast("double").as("recency"),
        (lit(CalibEndWeek) - min(wk)).cast("double").as("t_weeks"))
      .select(col("o_custkey").as("custkey"),
        col("frequency"), col("recency"), col("t_weeks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val local = calib.orderBy(col("custkey")).limit(4000)
      .as[(Long, Double, Double, Double)]
      .collect().toIndexedSeq.sortBy(_._1)
    val bg = BetaGeoModel.fit(local.map(r => (r._2, r._3, r._4)))
    val x = col("frequency"); val tx = col("recency"); val t = col("t_weeks")
    val scored = calib
      .withColumn("pred_visits", ClvColumns.expectedPurchases(bg, horizon, x, tx, t))
      .withColumn("prob_alive", ClvColumns.probAlive(bg, x, tx, t))
    val actual = orders.filter(to_date(col("o_orderdate")) >= lit(Cutoff))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).cast("double").as("actual_visits"))
    scored.join(actual, Seq("custkey"), "left_outer")
      .select(col("pred_visits"), col("prob_alive"),
        coalesce(col("actual_visits"), lit(0.0)).as("actual_visits"))
      .agg(
        count(lit(1)).as("n_custs"),
        sum(col("actual_visits")).cast("long").as("actual_total"),
        (sum(col("pred_visits")) / sum(col("actual_visits")))
          .between(0.5, 2.0).as("calibration_ok"),
        (avg(abs(col("pred_visits") - col("actual_visits"))) < 3.0).as("mae_ok"),
        (min(col("pred_visits")) >= 0.0 &&
          min(col("prob_alive")) >= 0.0 &&
          max(col("prob_alive")) <= 1.0).as("bounds_ok"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_clv_results"  -> (clvResults _),
    "q81_clv_segments" -> (clvSegments _),
    "q82_group_params" -> (groupModelParams _),
    "q83_clv_scored_columns" -> (clvScoredColumns _),
    "q86_clv_holdout" -> (clvHoldoutValidation _)
  )

  /** The MLE outputs themselves (q80-q83) are not SQL-expressible; the
    * holdout gate q86 states the SQL-knowable facts and pins the model
    * gates to `true`. */
  val oracles: Map[String, String] = Map(
    "q86_clv_holdout" ->
      """WITH c AS (SELECT o_custkey, count(*) AS n_calib
        |           FROM orders WHERE o_orderdate < '2000-01-01'
        |           GROUP BY o_custkey),
        |h AS (SELECT o_custkey, count(*) AS n_hold
        |      FROM orders WHERE o_orderdate >= '2000-01-01'
        |      GROUP BY o_custkey)
        |SELECT count(*) AS n_custs,
        |       CAST(coalesce(sum(h.n_hold), 0) AS BIGINT) AS actual_total,
        |       true AS calibration_ok, true AS mae_ok, true AS bounds_ok
        |FROM c LEFT JOIN h USING (o_custkey)""".stripMargin
  )
}
