package graft.queries

import graft.clv.ClvPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLV query surface (SURVEY.md §2.11 — the reference's modeling core).
  * The MLE score VALUES are not SQL-expressible (ClvSpec's golden /
  * property / replay tests cover them); what the DuckDB oracle CAN state
  * exactly is the RFM plumbing around the fit (grouping, week clock,
  * decimal money) plus model-invariant booleans a broken fit would blow
  * (probabilities in [0,1], predictions ≥ 0, segment ordering). q80/q81/
  * q83 are therefore quality gates in the q86 pattern: every emitted
  * column is either SQL-knowable or a pinned deterministic boolean.
  */
object ClvQueries {

  /** Model-invariant per-row gates shared by q80/q83: domains a broken
    * fit or scoring path would violate. `alive_ok` also pins the
    * reference's hardcoded PROB_ALIVE=1 for no-repeat customers
    * (ref DS:491-492). `profit_ok` is conditional on frequency > 1
    * because that is the population the Gamma-Gamma is FIT on (ref
    * DS:276): for a zero-repeat customer the conditional mean collapses
    * to the prior mean p·v/(q−1), which is legitimately negative when
    * the fitted q < 1 (this corpus at sf0.01; `lifetimes` yields the
    * same) — unconditional positivity is NOT a model invariant.
    * `clv_ok` pins the sign consistency of the discounting loop: CLV is
    * a nonnegative mixture of expected profit, so it can only go
    * negative when expected profit does. */
  private def rowGates = Seq(
    (col("prob_alive").between(0.0, 1.0) &&
      (col("frequency") > 0 || col("prob_alive") === 1.0)).as("alive_ok"),
    (col("pred_visits") >= 0.0).as("visits_ok"),
    (col("frequency") <= 1 || col("cond_exp_avg_profit") > 0.0)
      .as("profit_ok"),
    (col("pred_clv") >= 0.0 || col("cond_exp_avg_profit") < 0.0)
      .as("clv_ok"))

  /** The `ltv_results` table (ref DS:352-354) as a quality gate: the
    * distributed grouped fit runs end-to-end, the oracle re-derives every
    * RFM input column (group key, frequency, recency, age, decimal-exact
    * avg monetary — the q08 conventions) and the model outputs collapse
    * to the domain booleans. One row per customer, ordered. The full
    * score table remains the library surface (ClvPipeline.run). */
  def clvResults(s: SparkSession, dir: String): DataFrame =
    ClvPipeline.run(s, dir).toDF()
      .select(Seq(col("group_key"), col("custkey"), col("frequency"),
        col("recency"), col("age"), col("avg_monetary")) ++ rowGates: _*)
      .orderBy(col("custkey"))

  /** Segmentation over predicted visits (ref DS:371-383 CASE bucketing on
    * PRED_VISITS feeding the dashboard), as a structure gate: band
    * membership is model-derived, so the oracle pins the SQL-knowable
    * total plus orderings a sane model must produce — customers banded
    * "higher" by predicted visits have strictly higher average OBSERVED
    * frequency and higher average predicted CLV than lower bands. */
  def clvSegments(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bands = ClvPipeline.run(s, dir).toDF()
      .withColumn("visit_band",
        when(col("pred_visits") >= 8, "1_high")
          .when(col("pred_visits") >= 4, "2_mid")
          .when(col("pred_visits") >= 2, "3_low")
          .otherwise("4_minimal"))
      .groupBy(col("visit_band"))
      .agg(count(lit(1)).as("n"),
        avg(col("frequency")).as("avg_freq"),
        avg(col("pred_clv")).as("avg_clv"))
    // 2-4 rows: the window sort is trivial; lag compares adjacent
    // nonempty bands in label order (1_high first)
    val w = Window.orderBy(col("visit_band"))
    bands
      .withColumn("prev_freq", lag(col("avg_freq"), 1).over(w))
      .withColumn("prev_clv", lag(col("avg_clv"), 1).over(w))
      .agg(
        sum(col("n")).as("n_customers"),
        (count(lit(1)) <= 4).as("bands_le4"),
        min(coalesce(col("prev_freq") > col("avg_freq"), lit(true)))
          .as("freq_ordering_ok"),
        min(coalesce(col("prev_clv") > col("avg_clv"), lit(true)))
          .as("clv_ordering_ok"))
  }

  /** Per-group fitted BG/NBD parameters via the SQL aggregate form
    * (U9 — `fit_bgnbd` as a TypedImperativeAggregate in a GROUP BY).
    * Library surface; q82's oracle-gated form is [[groupParamsGate]]. */
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

  /** The fitted parameter VALUES aren't SQL-derivable, but their
    * consequences are — q82 as a quality gate in the q86 pattern. Per
    * group the oracle states the SQL-knowable facts (key, member count)
    * and pins the model-law booleans a broken fit would blow:
    * parameters strictly positive (MLE domain), a repeat fit over the
    * same rows bit-equal (determinism — the second aggregate is kept
    * from being deduplicated with the first so it genuinely runs),
    * every member's P(alive) in [0,1] under its OWN group's params, and
    * E[Y(t)] nondecreasing in t (cumulative purchases can't shrink).
    * Scoring joins the 20 fitted-param rows back via broadcast — the
    * fit-small / score-wide shape at any scale. */
  def groupParamsGate(s: SparkSession, dir: String): DataFrame = {
    import graft.clv.ClvColumns
    val x = col("frequency"); val tx = col("recency"); val t = col("t_weeks")
    val rfm = ClvPipeline.rfm(s, dir, nGroups = 20).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val params = rfm.groupBy(col("group_key"))
      .agg(
        graft.functions.BetaGeoFitAgg.fitBgnbd(x, tx, t).as("p1"),
        // `+ 0.0` keeps Catalyst from deduplicating the two identical
        // aggregates — the determinism probe needs both fits to run
        graft.functions.BetaGeoFitAgg.fitBgnbd(x + lit(0.0), tx, t).as("p2"))
    val r = col("p1.r"); val al = col("p1.alpha")
    val a = col("p1.a"); val b = col("p1.b")
    rfm.join(broadcast(params), "group_key")
      .select(col("group_key"),
        ClvColumns.probAliveP(r, al, a, b, x, tx, t).as("pa"),
        ClvColumns.expectedPurchasesP(r, al, a, b, lit(26.0), x, tx, t)
          .as("ey26"),
        ClvColumns.expectedPurchasesP(r, al, a, b, lit(52.0), x, tx, t)
          .as("ey52"),
        (r > 0.0 && al > 0.0 && a > 0.0 && b > 0.0).as("pos"),
        (r === col("p2.r") && al === col("p2.alpha") &&
          a === col("p2.a") && b === col("p2.b")).as("same"))
      .groupBy(col("group_key"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("pos")).as("params_pos_ok"),
        min(col("same")).as("repeat_fit_ok"),
        (min(col("pa")) >= 0.0 && max(col("pa")) <= 1.0)
          .as("alive_domain_ok"),
        min(col("ey52") >= col("ey26") - lit(1e-9))
          .as("visits_monotone_ok"))
      .orderBy(col("group_key"))
  }

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
      .select(Seq(col("custkey"), col("frequency")) ++ rowGates: _*)
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
    "q82_group_params" -> (groupParamsGate _),
    "q83_clv_scored_columns" -> (clvScoredColumns _),
    "q86_clv_holdout" -> (clvHoldoutValidation _)
  )

  /** The MLE score values are not SQL-expressible; every CLV query
    * states the SQL-knowable facts and pins the model gates to `true`. */
  val oracles: Map[String, String] = Map(
    "q82_group_params" ->
      """SELECT CAST(o_custkey % 20 + 1 AS BIGINT) AS group_key,
        |       count(DISTINCT o_custkey) AS n_customers,
        |       true AS params_pos_ok, true AS repeat_fit_ok,
        |       true AS alive_domain_ok, true AS visits_monotone_ok
        |FROM orders GROUP BY group_key ORDER BY group_key""".stripMargin,
    "q80_clv_results" ->
      """SELECT CAST(o_custkey % 20 + 1 AS BIGINT) AS group_key,
        |       o_custkey AS custkey,
        |       count(*) - 1 AS frequency,
        |       CAST(max(wk) - min(wk) AS DOUBLE) AS recency,
        |       CAST(344 - min(wk) AS DOUBLE) AS age,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         / count(o_totalprice) AS avg_monetary,
        |       true AS alive_ok, true AS visits_ok,
        |       true AS profit_ok, true AS clv_ok
        |FROM (SELECT o_custkey, o_totalprice,
        |             date_diff('day', DATE '1995-01-01',
        |                       CAST(o_orderdate AS DATE)) // 7 AS wk
        |      FROM orders) t
        |GROUP BY o_custkey ORDER BY custkey""".stripMargin,
    "q81_clv_segments" ->
      """SELECT count(DISTINCT o_custkey) AS n_customers,
        |       true AS bands_le4, true AS freq_ordering_ok,
        |       true AS clv_ordering_ok
        |FROM orders""".stripMargin,
    "q83_clv_scored_columns" ->
      """SELECT o_custkey AS custkey,
        |       CAST(count(*) - 1 AS DOUBLE) AS frequency,
        |       true AS alive_ok, true AS visits_ok,
        |       true AS profit_ok, true AS clv_ok
        |FROM orders GROUP BY o_custkey ORDER BY custkey""".stripMargin,
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
