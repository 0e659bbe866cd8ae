package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** [EXT] Window-function surface (SURVEY.md §2.9 — absent in the
  * reference; the "rank customers" goal there used a global ORDER BY).
  *
  * Scale notes: all per-customer windows partition on the natural key →
  * one shuffle on o_custkey, then sort within partitions; no global sort.
  * Window order keys always include a unique tiebreaker (o_orderkey) so
  * results are deterministic for the oracle diff. The one global window
  * (rank over nation revenue) runs on a 25-row aggregate — safe; a global
  * window over fact-sized data would single-partition and is avoided.
  */
object WindowQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** row_number top-N per group: top-3 orders per customer by price. */
  def top3OrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn").cast("long").as("rn"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** lag: change in order value vs the customer's previous order. */
  def priceDeltaPrev(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("delta",
        col("o_totalprice") - lag(col("o_totalprice"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("delta"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Running cumulative spend per customer (frame: unbounded preceding →
    * current row), summed through DECIMAL for order-insensitive totals. */
  def runningSpend(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .withColumn("running_spend",
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** rank over an aggregate: nations ranked by total revenue (dim-sized
    * input → the single-partition global window is intentional). */
  def nationRevenueRank(s: SparkSession, dir: String): DataFrame = {
    val base = RefQueries.revenueByNation(s, dir)
    base
      .withColumn("rnk",
        rank().over(Window.orderBy(col("revenue").desc, col("n_name")))
          .cast("long"))
      .select(col("rnk"), col("n_name"), col("revenue"))
      .orderBy(col("rnk"), col("n_name"))
  }

  /** ntile: customers split into spend quartiles. The oracle semantic
    * is exact SQL `ntile(4)` over the total order (spend DESC,
    * o_custkey) — but a `Window.orderBy` with no partition funnels every
    * customer through ONE task, and customers scale with the data. The
    * scalable form is [[graft.operators.GlobalRank]]'s range-exchange +
    * zipWithIndex two-pass enumeration (which also yields the total n
    * for free), then the exact ntile bucket is pure arithmetic on
    * (rank, n) — identical assignment to the window form on every input,
    * proven by ScaleOpsSpec's ntile law, with no single-partition stage
    * anywhere in the plan. */
  def spendQuartiles(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.GlobalRank
    val spend = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(graft.Tables.sumMoney(col("o_totalprice")).as("spend"))
    GlobalRank.withGlobalRankAndCount(spend,
        Seq(col("spend").desc, col("o_custkey")), "i", "n_total")
      .withColumn("quartile",
        GlobalRank.ntileFromRank(col("i"), col("n_total"), 4))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n_cust"),
        graft.Tables.sumMoney(col("spend")).as("total_spend"))
      .orderBy(col("quartile"))
  }

  /** The custom whole-operator path (§2 extension mechanism (c)):
    * [[graft.plans.TopKPerGroup]] — logical node + planner strategy +
    * bounded-heap physical operator — computing top-3 orders per
    * customer by price. Same semantics as q30's window form, but the
    * physical plan keeps k rows per key instead of sorting every group;
    * the oracle is the row_number() formulation. */
  def top3PerCustomerCustomOp(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerGroup.topK(
        Tables.load(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        groupCols = Seq("o_custkey"),
        orderCols = Seq(("o_totalprice", false), ("o_orderkey", true)),
        k = 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))

  /** The optimizer-rule path (§2 extension mechanism (d) —
    * [[graft.plans.WindowTopKRewrite]]): the USER writes the ordinary
    * rank-discarding window idiom (`row_number() ≤ 3`, rank projected
    * away); the injected `Rule[LogicalPlan]` rewrites it into the same
    * bounded-heap operator q96 calls explicitly. TopKPerGroupSpec
    * asserts the rewrite actually fires; the oracle pins that rewriting
    * changes nothing about the answer. */
  def top3PerCustomerViaRule(s: SparkSession, dir: String): DataFrame = {
    graft.plans.WindowTopKRewrite.enable(s)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** q165: time-based RANGE frame — each customer's trailing-30-day
    * spend at every order (the value-based sliding window row frames
    * can't express: the frame is `[day-29, day]` regardless of how many
    * orders land inside it). Both engines order by integer epoch-day,
    * so the RANGE arithmetic is exact; sums are DECIMAL (order-free).
    * Same one-shuffle-per-key scale shape as every window here. */
  def trailingSpendRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"))
      .rangeBetween(-29, Window.currentRow)
    t(s, dir, "orders")
      .withColumn("day", datediff(to_date(col("o_orderdate")),
        lit("1970-01-01").cast("date")).cast("long"))
      .withColumn("trail30",
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double"))
      .filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"), col("day"),
        col("trail30"))
      .orderBy(col("o_custkey"), col("day"), col("o_orderkey"))
  }

  /** q166: exact median / discrete quantiles per group — `median`
    * (interpolated, matching DuckDB's continuous default) and
    * `percentile(…, 0.25/0.75, discrete)` vs `quantile_disc`. Exact
    * (sort-based) on both engines, so values hash-match without
    * rounding. Spark's exact percentile shuffles per group — fine at
    * 5 groups; the approximate path for wide cardinalities is q97's
    * KLL sketch. */
  def groupMedians(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("median(o_totalprice)").as("med"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)")
          .as("q25"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)")
          .as("q75"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q165_trailing_range_window" -> (trailingSpendRange _),
    "q166_group_medians"         -> (groupMedians _),
    "q135_window_topk_rule"    -> (top3PerCustomerViaRule _),
    "q96_topk_custom_op"       -> (top3PerCustomerCustomOp _),
    "q36_spend_quartiles"      -> (spendQuartiles _),
    "q30_top3_orders_per_cust" -> (top3OrdersPerCustomer _),
    "q31_price_delta_prev"     -> (priceDeltaPrev _),
    "q32_running_spend"        -> (runningSpend _),
    "q33_nation_revenue_rank"  -> (nationRevenueRank _)
  )

  val oracles: Map[String, String] = Map(
    // integer epoch-day RANGE frame, decimal windowed sum
    "q165_trailing_range_window" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(datediff('day', DATE '1970-01-01',
        |                     CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |         PARTITION BY o_custkey
        |         ORDER BY datediff('day', DATE '1970-01-01',
        |                           CAST(o_orderdate AS DATE))
        |         RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
        |       AS DOUBLE) AS trail30
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, day, o_orderkey""".stripMargin,
    // exact sort-based median/quantiles on both engines
    "q166_group_medians" ->
      """SELECT o_orderpriority,
        |       median(o_totalprice) AS med,
        |       quantile_disc(o_totalprice, 0.25) AS q25,
        |       quantile_disc(o_totalprice, 0.75) AS q75,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q135_window_topk_rule" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q96_topk_custom_op" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q36_spend_quartiles" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT CAST(q AS BIGINT) AS quartile, count(*) AS n_cust,
        |       CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM (SELECT spend,
        |             ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS q
        |      FROM spend) t
        |GROUP BY q ORDER BY quartile""".stripMargin,
    "q30_top3_orders_per_cust" ->
      """SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q31_price_delta_prev" ->
      """SELECT o_custkey, o_orderkey,
        |       o_totalprice - lag(o_totalprice, 1) OVER (
        |           PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS delta
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q32_running_spend" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |           PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q33_nation_revenue_rank" ->
      """WITH rev AS (
        |  SELECT n_name,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name)
        |SELECT CAST(rank() OVER (ORDER BY revenue DESC, n_name) AS BIGINT) AS rnk,
        |       n_name, revenue
        |FROM rev ORDER BY rnk, n_name""".stripMargin
  )
}
