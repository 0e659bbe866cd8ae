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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_clv_results"  -> (clvResults _),
    "q81_clv_segments" -> (clvSegments _),
    "q82_group_params" -> (groupModelParams _),
    "q83_clv_scored_columns" -> (clvScoredColumns _)
  )

  /** No oracle SQL — MLE output is not expressible in DuckDB. */
  val oracles: Map[String, String] = Map.empty
}
