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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_clv_results"  -> (clvResults _),
    "q81_clv_segments" -> (clvSegments _)
  )

  /** No oracle SQL — MLE output is not expressible in DuckDB. */
  val oracles: Map[String, String] = Map.empty
}
