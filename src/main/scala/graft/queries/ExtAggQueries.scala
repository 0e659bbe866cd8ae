package graft.queries

import graft.Tables
import graft.Tables.sumMoney
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Aggregation extensions (SURVEY.md §2.4 A11): ROLLUP grouping
  * sets and HLL-based approximate distinct counts — the 100 TB substitute
  * for exact COUNT(DISTINCT) when the distinct key no longer fits a
  * shuffle (approx_count_distinct is a single-pass, mergeable sketch; no
  * Expand explosion, no second shuffle).
  */
object ExtAggQueries {

  /** ROLLUP (yr, mo): per-month, per-year subtotal, and grand total rows.
    * Null ordering pinned NULLS FIRST to match across engines. */
  def revenueRollup(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .rollup(
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("revenue"))
      .orderBy(col("yr").asc_nulls_first, col("mo").asc_nulls_first)

  /** CUBE over (status, priority): all 4 grouping-set combinations. */
  def statusPriorityCube(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** HLL approximate distinct. Sketch estimates differ between engines,
    * so the oracle-checked output is the exact count plus a boolean
    * asserting the HLL estimate landed within the configured 5% rsd
    * bound — this exercises approx_count_distinct end-to-end (the
    * sketch is deterministic for fixed data: HLL merge is commutative)
    * while keeping the result engine-portable. */
  def approxDistinctParts(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_suppkey")).as("exact_supps"),
        // rsd 0.02 sketch vs 5% asserted bound = 2.5 sigma of margin,
        // so the hardcoded-true oracle is robust to dataset changes
        // (a bound equal to the 1-sigma rsd would fail ~1/3 of the time
        // on fresh data)
        (abs(approx_count_distinct(col("l_partkey"), 0.02).cast("double") -
          countDistinct(col("l_partkey")).cast("double")) /
          countDistinct(col("l_partkey")).cast("double") <= 0.05)
          .as("parts_within_bound"),
        (abs(approx_count_distinct(col("l_suppkey"), 0.02).cast("double") -
          countDistinct(col("l_suppkey")).cast("double")) /
          countDistinct(col("l_suppkey")).cast("double") <= 0.05)
          .as("supps_within_bound"))

  /** Pivot: order counts by year × status (columns per status value). */
  def yearStatusPivot(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L)
      .orderBy(col("yr"))

  /** Content-defined reproducible sampling (the data-curation way to
    * sample at scale: membership depends only on the row's key, never on
    * partitioning/seed state — re-runs and engines agree exactly).
    * Keeps keys whose md5 starts with 0 or 1 (≈1/8 sample). */
  def contentSample(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1)
        .isin("0", "1"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sumMoney(col("o_totalprice")).as("revenue"))
      .orderBy(col("o_orderstatus"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_revenue_rollup"       -> (revenueRollup _),
    "q46_status_priority_cube" -> (statusPriorityCube _),
    "q47_approx_distinct"      -> (approxDistinctParts _),
    "q34_year_status_pivot"    -> (yearStatusPivot _),
    "q35_content_sample"       -> (contentSample _)
  )

  val oracles: Map[String, String] = Map(
    "q47_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |       count(DISTINCT l_suppkey) AS exact_supps,
        |       true AS parts_within_bound,
        |       true AS supps_within_bound
        |FROM lineitem""".stripMargin,
    "q45_revenue_rollup" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       count(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY ROLLUP (yr, mo)
        |ORDER BY yr NULLS FIRST, mo NULLS FIRST""".stripMargin,
    "q46_status_priority_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q34_year_status_pivot" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       count(*) FILTER (o_orderstatus = 'F') AS F,
        |       count(*) FILTER (o_orderstatus = 'O') AS O,
        |       count(*) FILTER (o_orderstatus = 'P') AS P
        |FROM orders GROUP BY yr ORDER BY yr""".stripMargin,
    "q35_content_sample" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
