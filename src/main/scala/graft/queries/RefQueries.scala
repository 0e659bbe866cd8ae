package graft.queries

import graft.Tables
import graft.Tables.{avgMoney, isoDate, sumMoney}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reference-surface relational queries (SURVEY.md §2.1–§2.8), re-expressed
  * over the driver star schema: `orders`/`lineitem` stand in for the
  * reference's denormalized `online_retail_train` (customer key =
  * o_custkey, date = o_orderdate, profit = o_totalprice — FIXTURES.md §B).
  *
  * Every query is paired with ANSI SQL in [[oracles]] that DuckDB runs on
  * the same parquet; results must hash-match, so each query:
  *  - ends in a total ORDER BY (deterministic row order, ties broken),
  *  - sums money through DECIMAL(18,2) (order-insensitive; see
  *    [[graft.Tables.sumMoney]]),
  *  - renders temporal values as ISO strings,
  *  - casts small-int derivations to BIGINT to match DuckDB's widths.
  *
  * Scale notes (100 TB): all aggregations here are partial+final hash
  * aggregates on the grouping key — map-side combine keeps shuffle volume
  * proportional to group count, not row count. Joins to `nation` (25 rows)
  * are explicitly broadcast; the orders⋈customer join shuffles on the
  * natural key and AQE handles skew/coalescing at runtime.
  */
object RefQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** A1+O1 flagship (ref DE_data_preparation.py:38-42 "profit per country"):
    * revenue per nation, descending. Nation dim is broadcast. */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val orders   = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    val nation   = t(s, dir, "nation")
    // Partial aggregation below the join (100 TB shape): collapse the
    // orders fact to one exact-decimal row per customer BEFORE joining,
    // so the join shuffles |customers| rows instead of |orders|.
    // Decimal partial sums re-sum exactly, so the result is identical
    // to aggregating after the join.
    val perCust = orders
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev_part"))
    perCust
      .join(customer, perCust("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev_part")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** A2+A8+O2 (ref DS_cust_lifetime_value.py:83-92): distinct active
    * customers per calendar month. */
  def monthlyActiveCustomers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(countDistinct(col("o_custkey")).as("active_customers"))
      .orderBy(col("yr"), col("mo"))

  /** A3 (ref SQL_CLV_Insights.py:13): global COUNT(DISTINCT). */
  def totalCustomers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").agg(countDistinct(col("o_custkey")).as("n_customers"))

  /** A7 multi-aggregate in one GROUP BY (ref DS:83-92). */
  def monthlySummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(col("o_orderkey")).as("n_orders"),
        sumMoney(col("o_totalprice")).as("revenue"))
      .orderBy(col("yr"), col("mo"))

  /** P3+F1 (ref DS:89 `WHERE year(invdate) = 2011`). The year() form is
    * NOT pushdown-able (parquet sees only IsNotNull and scans every row
    * group); the equivalent half-open timestamp range reaches the scan as
    * `PushedFilters: [GreaterThanOrEqual, LessThan]` → row-group pruning,
    * which is the difference between reading one year and reading all of
    * a 100 TB fact table. Semantics identical under the UTC session TZ. */
  def priorityCounts1995(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** P10 CASE bucketing (ref DS:373-379 5-branch segmentation). */
  def orderValueSegments(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("segment",
        when(col("o_totalprice") <= 50000, "1_small")
          .when(col("o_totalprice") <= 150000, "2_medium")
          .when(col("o_totalprice") <= 300000, "3_large")
          .otherwise("4_xlarge"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("revenue"))
      .orderBy(col("segment"))

  /** D1 (ref DE_data_preparation.py:47 SELECT DISTINCT two columns). */
  def distinctBrandType(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_brand"), col("p_type"))
      .distinct()
      .orderBy(col("p_brand"), col("p_type"))

  /** Week number since the dataset epoch (1995-01-01), the `weekno`
    * analog (ref DS:123-124). */
  private def weekno = floor(
    datediff(to_date(col("o_orderdate")), lit("1995-01-01")) / 7).cast("long")

  /** End-of-observation week for T (orders span 1995-01-01..2001-08-01 →
    * week 343; 344 = "one past", mirroring ref's `51 - min(weekno)` with
    * 51 = one past week 50). */
  val EndWeek = 344

  /** A9 — the reference's signature RFM derived table
    * (ref DS_cust_lifetime_value.py:122-128, :428-435):
    * per-customer T, Recency, Frequency, avg monetary. */
  def rfmSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        (lit(EndWeek) - min(weekno)).as("t_weeks"),
        (max(weekno) - min(weekno)).as("recency"),
        (count(lit(1)) - 1).as("frequency"),
        avgMoney(col("o_totalprice")).as("avg_monetary"))
      .orderBy(col("o_custkey"))

  /** P8+P9 modulo partition key (ref DS:429 `CustomerID%1+1 AS GroupKey`,
    * generalized to %20 per the ref's stated 1..20 intent at DS:414-418). */
  def groupKeyCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy((col("o_custkey") % 20 + 1).cast("long").as("group_key"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_cust"))
      .orderBy(col("group_key"))

  /** O3 top-k (ref DS:214 sort_values().head(5)) — compiles to
    * TakeOrderedAndProject, no global sort materialized. */
  def topCustomers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sumMoney(col("o_totalprice")).as("spend"))
      .orderBy(col("spend").desc, col("o_custkey"))
      .limit(10)

  /** A5 min/max grouped (ref DS:123-124), dates rendered as ISO text. */
  def statusDates(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        isoDate(min(col("o_orderdate"))).as("first_date"),
        isoDate(max(col("o_orderdate"))).as("last_date"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** A6 AVG grouped (ref DS:126). */
  def segmentBalance(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(avgMoney(col("c_acctbal")).as("avg_acctbal"),
        count(lit(1)).as("n_cust"))
      .orderBy(col("c_mktsegment"))

  /** A10 Pearson correlation (ref DS:287 model-assumption check). */
  def corrQtyPrice(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4)
        .as("corr_qp"))

  /** Q1 derived-table subquery via the SQL entry path (ref DS:371-383;
    * alias `t` added — vanilla Spark/ANSI requires it, Databricks didn't). */
  def bucketSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT bucket, count(*) AS n
        |FROM (SELECT CASE WHEN o_totalprice <= 100000 THEN 'low'
        |                  WHEN o_totalprice <= 250000 THEN 'mid'
        |                  ELSE 'high' END AS bucket
        |      FROM orders) t
        |GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  /** D2 [EXT] UNION (distinct) of nation keys from two tables. */
  def unionNationKeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").cast("long").as("nationkey"))
      .union(t(s, dir, "supplier").select(col("s_nationkey").cast("long")))
      .distinct()
      .orderBy(col("nationkey"))

  /** D2 [EXT] INTERSECT. */
  def intersectNationKeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").cast("long").as("nationkey"))
      .intersect(
        t(s, dir, "supplier").select(col("s_nationkey").cast("long")))
      .orderBy(col("nationkey"))

  /** D2 [EXT] EXCEPT — part sizes that are not nation keys (non-empty by
    * construction: sizes run past 24). */
  def exceptSizes(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(col("p_size").cast("long").as("k"))
      .except(t(s, dir, "nation").select(col("n_nationkey").cast("long")))
      .orderBy(col("k"))

  /** O1 ordering by an aggregate (ref DS:98-102 `ORDER BY count(DISTINCT
    * CustomerID) DESC`) over a year × nation rollup. */
  def activeByYearNation(s: SparkSession, dir: String): DataFrame = {
    val orders   = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    val nation   = t(s, dir, "nation")
    // Dedup below the join (100 TB shape): the COUNT(DISTINCT custkey)
    // per (year, nation) only needs the distinct (year, custkey) pairs —
    // collapsing the fact first shrinks the join input from |orders| to
    // |active customer-years|, and the distinct-aggregate becomes a
    // plain count afterwards (each customer maps to exactly one nation).
    val activePairs = orders
      .select(year(col("o_orderdate")).cast("long").as("yr"), col("o_custkey"))
      .distinct()
    activePairs
      .join(customer, activePairs("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("yr"), col("n_name"))
      .agg(count(lit(1)).as("active"))
      .orderBy(col("active").desc, col("yr"), col("n_name"))
      .limit(25)
  }

  /** Q3 [EXT] scalar subquery through the SQL path; the scalar is a
    * decimal-exact mean so both engines filter on the identical double. */
  def aboveAvgPriority(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |                                  AS DOUBLE) / COUNT(*) FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** Q3 [EXT] correlated EXISTS through the SQL path (decorrelated by
    * Catalyst into a semi join). */
  def existsBigOrderByNation(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer")
    t(s, dir, "nation").createOrReplaceTempView("nation")
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
  }

  /** P7 surrogate keys via monotonically_increasing_id()+1 (ref DS:166).
    * Values are partition-dependent, so the checked output is the
    * uniqueness contract, not the ids. */
  def surrogateIds(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("sk", monotonically_increasing_id() + 1)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("sk")).as("n_distinct_sk"),
        min(col("sk")).cast("long").as("min_sk"))

  /** [EXT] Exact interpolated percentiles per group (Spark `percentile`
    * and DuckDB `quantile_cont` both use linear interpolation at rank
    * (n-1)·p over the sorted values, so results agree to the ulp;
    * rounded to cents for the oracle hash). At 100 TB exact percentiles
    * need a full sort per group — `approx_percentile` (t-digest) is the
    * scale substitute, same API shape. */
  def pricePercentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 2).as("p99"))
      .orderBy(col("o_orderstatus"))

  /** F4 [EXT] string scalar functions: lower/substring/regexp/lpad. */
  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        lower(col("p_brand")).as("brand_lower"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
        lpad(col("p_size").cast("string"), 3, "0").as("size_padded"))
      .groupBy(col("brand_lower"), col("type_head"))
      .agg(count(lit(1)).as("n"), max(col("size_padded")).as("max_size_padded"))
      .orderBy(col("brand_lower"), col("type_head"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_revenue_by_nation"    -> (revenueByNation _),
    "q02_monthly_active"       -> (monthlyActiveCustomers _),
    "q03_total_customers"      -> (totalCustomers _),
    "q04_monthly_summary"      -> (monthlySummary _),
    "q05_priority_counts_1995" -> (priorityCounts1995 _),
    "q06_order_value_segments" -> (orderValueSegments _),
    "q07_distinct_brand_type"  -> (distinctBrandType _),
    "q08_rfm_summary"          -> (rfmSummary _),
    "q09_groupkey_counts"      -> (groupKeyCounts _),
    "q10_top_customers"        -> (topCustomers _),
    "q11_status_dates"         -> (statusDates _),
    "q12_segment_balance"      -> (segmentBalance _),
    "q13_corr_qty_price"       -> (corrQtyPrice _),
    "q14_bucket_subquery"      -> (bucketSubquery _),
    "q15_union_nationkeys"     -> (unionNationKeys _),
    "q16_intersect_nationkeys" -> (intersectNationKeys _),
    "q17_except_sizes"         -> (exceptSizes _),
    "q18_active_year_nation"   -> (activeByYearNation _),
    "q19_above_avg_priority"   -> (aboveAvgPriority _),
    "q25_surrogate_ids"        -> (surrogateIds _),
    "q29_price_percentiles"    -> (pricePercentiles _),
    "q26_string_funcs"         -> (stringFuncs _),
    "q27_exists_big_orders"    -> (existsBigOrderByNation _)
  )

  private val SumPrice =
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "q01_revenue_by_nation" ->
      s"""SELECT n_name, $SumPrice AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q02_monthly_active" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       count(DISTINCT o_custkey) AS active_customers
        |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin,
    "q03_total_customers" ->
      "SELECT count(DISTINCT o_custkey) AS n_customers FROM orders",
    "q04_monthly_summary" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         |       CAST(month(o_orderdate) AS BIGINT) AS mo,
         |       count(DISTINCT o_custkey) AS n_cust,
         |       count(o_orderkey) AS n_orders,
         |       $SumPrice AS revenue
         |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin,
    "q05_priority_counts_1995" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE year(o_orderdate) = 1995
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q06_order_value_segments" ->
      s"""SELECT CASE WHEN o_totalprice <= 50000 THEN '1_small'
         |            WHEN o_totalprice <= 150000 THEN '2_medium'
         |            WHEN o_totalprice <= 300000 THEN '3_large'
         |            ELSE '4_xlarge' END AS segment,
         |       count(*) AS n, $SumPrice AS revenue
         |FROM orders GROUP BY segment ORDER BY segment""".stripMargin,
    "q07_distinct_brand_type" ->
      """SELECT DISTINCT p_brand, p_type FROM part
        |ORDER BY p_brand, p_type""".stripMargin,
    "q08_rfm_summary" ->
      """SELECT o_custkey,
        |       344 - min(wk) AS t_weeks,
        |       max(wk) - min(wk) AS recency,
        |       count(*) - 1 AS frequency,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         / count(o_totalprice) AS avg_monetary
        |FROM (SELECT o_custkey, o_totalprice,
        |             date_diff('day', DATE '1995-01-01',
        |                       CAST(o_orderdate AS DATE)) // 7 AS wk
        |      FROM orders) t
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q09_groupkey_counts" ->
      """SELECT CAST(o_custkey % 20 + 1 AS BIGINT) AS group_key,
        |       count(*) AS n_orders, count(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY group_key ORDER BY group_key""".stripMargin,
    "q10_top_customers" ->
      s"""SELECT o_custkey, $SumPrice AS spend FROM orders
         |GROUP BY o_custkey ORDER BY spend DESC, o_custkey LIMIT 10""".stripMargin,
    "q11_status_dates" ->
      """SELECT o_orderstatus,
        |       strftime(min(o_orderdate), '%Y-%m-%d') AS first_date,
        |       strftime(max(o_orderdate), '%Y-%m-%d') AS last_date,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q12_segment_balance" ->
      """SELECT c_mktsegment,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         / count(c_acctbal) AS avg_acctbal,
        |       count(*) AS n_cust
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q13_corr_qty_price" ->
      "SELECT round(corr(l_quantity, l_extendedprice), 4) AS corr_qp FROM lineitem",
    "q14_bucket_subquery" ->
      """SELECT bucket, count(*) AS n
        |FROM (SELECT CASE WHEN o_totalprice <= 100000 THEN 'low'
        |                  WHEN o_totalprice <= 250000 THEN 'mid'
        |                  ELSE 'high' END AS bucket
        |      FROM orders) t
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q15_union_nationkeys" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |UNION
        |SELECT CAST(s_nationkey AS BIGINT) FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q16_intersect_nationkeys" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS BIGINT) FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q17_except_sizes" ->
      """SELECT CAST(p_size AS BIGINT) AS k FROM part
        |EXCEPT
        |SELECT CAST(n_nationkey AS BIGINT) FROM nation
        |ORDER BY k""".stripMargin,
    "q18_active_year_nation" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, n_name,
        |       count(DISTINCT o_custkey) AS active
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY yr, n_name ORDER BY active DESC, yr, n_name LIMIT 25""".stripMargin,
    "q19_above_avg_priority" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |                                  AS DOUBLE) / COUNT(*) FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // surrogate ids are partition-dependent; the oracle checks the
    // uniqueness contract (n_distinct == n_rows, ids start at >= 1)
    "q25_surrogate_ids" ->
      """SELECT count(*) AS n_rows, count(*) AS n_distinct_sk,
        |       CAST(1 AS BIGINT) AS min_sk FROM orders""".stripMargin,
    "q29_price_percentiles" ->
      """SELECT o_orderstatus,
        |       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |       round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        |       round(quantile_cont(o_totalprice, 0.99), 2) AS p99
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q26_string_funcs" ->
      """SELECT lower(p_brand) AS brand_lower,
        |       regexp_extract(p_type, '^(\w+)', 1) AS type_head,
        |       count(*) AS n,
        |       max(lpad(CAST(p_size AS VARCHAR), 3, '0')) AS max_size_padded
        |FROM part GROUP BY brand_lower, type_head
        |ORDER BY brand_lower, type_head""".stripMargin,
    "q27_exists_big_orders" ->
      """SELECT n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY n_name ORDER BY n_name""".stripMargin
  )
}
