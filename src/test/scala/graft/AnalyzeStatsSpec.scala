package graft

import org.apache.spark.sql.functions._

/** `ANALYZE TABLE … COMPUTE STATISTICS` + CBO: the statistics pipeline a
  * 100 TB deployment lives on. Without table/column stats the optimizer
  * estimates from raw file sizes; after ANALYZE the catalog carries
  * rowCount and per-column NDV/min/max, and with `spark.sql.cbo.enabled`
  * the logical plan's row estimates come from those stats — which is
  * what makes join ordering and broadcast decisions right at scale. */
class AnalyzeStatsSpec extends SparkSpec {

  test("ANALYZE fills catalog stats and CBO uses column stats for " +
    "filter estimates") {
    val orders = Tables.load(spark, sf, "orders")
    val n = orders.count()
    spark.sql("DROP TABLE IF EXISTS orders_stats_t")
    orders.write.saveAsTable("orders_stats_t")
    try {
      spark.sql("ANALYZE TABLE orders_stats_t COMPUTE STATISTICS " +
        "FOR COLUMNS o_custkey, o_totalprice, o_orderstatus")
      // catalog now carries the exact row count…
      val detail = spark.sql("DESCRIBE TABLE EXTENDED orders_stats_t")
        .filter(col("col_name") === "Statistics")
        .select(col("data_type")).head().getString(0)
      assert(detail.contains(s"$n rows"), s"catalog stats missing: $detail")
      // …and per-column stats (distinct counts) are queryable
      val ndv = spark.sql(
        "DESCRIBE EXTENDED orders_stats_t o_orderstatus")
        .filter(col("info_name") === "distinct_count")
        .select(col("info_value")).head().getString(0).toLong
      assert(ndv >= 2 && ndv <= 4, s"implausible NDV for 3 statuses: $ndv")
      // with CBO on, a selective filter's row estimate derives from the
      // column histogram/NDV instead of defaulting to the full size
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val est = spark.table("orders_stats_t")
          .filter(col("o_orderstatus") === "F")
          .queryExecution.optimizedPlan.stats.rowCount
        assert(est.isDefined, "CBO produced no row-count estimate")
        val actual = orders.filter(col("o_orderstatus") === "F").count()
        val e = est.get.toLong
        // NDV-based estimate: n / ndv — sanity band, not exactness
        assert(e > 0 && e < n,
          s"estimate $e not a selective fraction of $n")
        assert(math.abs(e - actual) < n / 2,
          s"estimate $e wildly off actual $actual")
      } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    } finally spark.sql("DROP TABLE IF EXISTS orders_stats_t")
  }

  test("q243's 100 TB twin: the same profile plan with " +
    "approx_count_distinct lands within HLL error of the exact counts") {
    // same wide-aggregate shape as MiscQueries.columnProfile, with each
    // exact countDistinct swapped for the HLL sketch (the q47/q97/q112
    // exact+sketch pairing the q243 scaladoc names as the scale path) —
    // per-distinct Expand shuffle state becomes fixed-size buffers
    val orders = Tables.load(spark, sf, "orders")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    def profile(distinct: String => org.apache.spark.sql.Column) = {
      val aggs = cols.map(c => distinct(c).as(s"nd_$c"))
      orders.agg(aggs.head, aggs.tail: _*).head()
    }
    val exact = profile(c => countDistinct(col(c)))
    val approx = profile(c => approx_count_distinct(col(c), 0.02))
    cols.zipWithIndex.foreach { case (c, i) =>
      val e = exact.getLong(i).toDouble
      val a = approx.getLong(i).toDouble
      assert(math.abs(a - e) <= math.max(2.0, 0.05 * e),
        s"$c: approx $a vs exact $e beyond the 5% HLL band")
    }
  }
}
