package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-TEXT variants of reference-shaped queries (SURVEY §3.1: the
  * reference's dominant entry path is `%sql` strings, ~20 of its queries;
  * the DataFrame packs cover the semantics, this pack covers the parser
  * path users actually porting notebooks take). Each query registers the
  * raw tables as temp views and goes through `spark.sql(...)` — same
  * Catalyst plans as the DataFrame twins, so each shares its twin's
  * oracle entry verbatim.
  */
object SqlQueries {

  private def view(s: SparkSession, dir: String, name: String): String = {
    val v = s"sqlq_$name"
    Tables.load(s, dir, name).createOrReplaceTempView(v)
    v
  }

  /** q06's 4-branch CASE dashboard segmentation (ref DS:373-379) as SQL
    * text. */
  def sqlOrderSegments(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql(
      s"""SELECT CASE WHEN o_totalprice <= 50000 THEN '1_small'
         |            WHEN o_totalprice <= 150000 THEN '2_medium'
         |            WHEN o_totalprice <= 300000 THEN '3_large'
         |            ELSE '4_xlarge' END AS segment,
         |       count(*) AS n,
         |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |         AS revenue
         |FROM $orders GROUP BY segment ORDER BY segment""".stripMargin)
  }

  /** q08's RFM summary through the reference's actual shape: a
    * `CREATE TEMP VIEW ... AS SELECT` DDL statement (S8) followed by a
    * query over the view — the `%sql` view-chain idiom
    * (ref DS_cust_lifetime_value.py:122-128). */
  def sqlRfmViewChain(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW sqlq_rfm_weeks AS
         |SELECT o_custkey, o_totalprice,
         |       CAST(floor(datediff(to_date(o_orderdate),
         |                           DATE '1995-01-01') / 7) AS BIGINT) AS wk
         |FROM $orders""".stripMargin)
    s.sql(
      """SELECT o_custkey,
        |       344 - min(wk) AS t_weeks,
        |       max(wk) - min(wk) AS recency,
        |       count(*) - 1 AS frequency,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         / count(o_totalprice) AS avg_monetary
        |FROM sqlq_rfm_weeks GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
  }

  /** q45's ROLLUP subtotals as SQL text (GROUP BY ROLLUP syntax). */
  def sqlRevenueRollup(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql(
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         |       CAST(month(o_orderdate) AS BIGINT) AS mo,
         |       count(*) AS n,
         |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |         AS revenue
         |FROM $orders
         |GROUP BY ROLLUP (CAST(year(o_orderdate) AS BIGINT),
         |                 CAST(month(o_orderdate) AS BIGINT))
         |ORDER BY yr ASC NULLS FIRST, mo ASC NULLS FIRST""".stripMargin)
  }

  /** q33's nation revenue ranking as SQL text: CTE + join chain + window
    * rank through the parser. */
  def sqlNationRevenueRank(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    val customer = view(s, dir, "customer")
    val nation = view(s, dir, "nation")
    s.sql(
      s"""WITH rev AS (
         |  SELECT n_name,
         |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |           AS revenue
         |  FROM $orders JOIN $customer ON o_custkey = c_custkey
         |  JOIN $nation ON c_nationkey = n_nationkey
         |  GROUP BY n_name)
         |SELECT CAST(rank() OVER (ORDER BY revenue DESC, n_name) AS BIGINT)
         |         AS rnk,
         |       n_name, revenue
         |FROM rev ORDER BY rnk, n_name""".stripMargin)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q99_sql_order_segments"  -> (sqlOrderSegments _),
    "q100_sql_rfm_view_chain" -> (sqlRfmViewChain _),
    "q101_sql_revenue_rollup" -> (sqlRevenueRollup _),
    "q102_sql_nation_rank"    -> (sqlNationRevenueRank _)
  )

  /** Same results as the DataFrame twins → the twins' oracles verbatim. */
  val oracles: Map[String, String] = Map(
    "q99_sql_order_segments"  -> RefQueries.oracles("q06_order_value_segments"),
    "q100_sql_rfm_view_chain" -> RefQueries.oracles("q08_rfm_summary"),
    "q101_sql_revenue_rollup" -> ExtAggQueries.oracles("q45_revenue_rollup"),
    "q102_sql_nation_rank"    -> WindowQueries.oracles("q33_nation_revenue_rank")
  )
}
