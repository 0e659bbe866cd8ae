package graft

import graft.queries._
import org.apache.spark.sql.functions._

class ExtQueriesSpec extends SparkSpec {

  test("q22 semi + q23 anti: anti is disjoint from big-order customers") {
    val semiTotal = JoinQueries.customersWithOrders(spark, sf)
      .agg(sum("n")).head().getLong(0)
    val customers = Tables.load(spark, sf, "customer").count()
    assert(semiTotal <= customers)
  }

  test("q24 left join keeps all 25 nations") {
    assert(JoinQueries.nationSupplierCounts(spark, sf).count() == 25)
  }

  test("q30 row_number: at most 3 rows per customer, rn in 1..3") {
    val df = WindowQueries.top3OrdersPerCustomer(spark, sf)
    val bad = df.groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(bad == 0)
    assert(df.filter(col("rn") < 1 || col("rn") > 3).count() == 0)
  }

  test("q32 running spend conserves rows and stays positive") {
    val df = WindowQueries.runningSpend(spark, sf)
    assert(df.count() == Tables.load(spark, sf, "orders").count())
    assert(df.filter(col("running_spend") <= 0).count() == 0)
  }

  test("q40 hourly stats cover every event exactly once") {
    val total = EventQueries.hourlyEventStats(spark, sf)
      .agg(sum("n")).head().getLong(0)
    assert(total == Tables.load(spark, sf, "events").count())
  }

  test("q44 sliding windows double-count each event") {
    val total = EventQueries.slidingWindowCounts(spark, sf)
      .agg(sum("n")).head().getLong(0)
    assert(total == 2 * Tables.load(spark, sf, "events").count())
  }

  test("q41 sessions: per-user session spans don't overlap") {
    val sessions = EventQueries.userSessions(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_start")
    val overlaps = sessions
      .withColumn("prev_end", lag(col("session_end"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("session_start") < col("prev_end"))
      .count()
    // session_end includes the +gap extension, so starts may touch the
    // previous end only when the gap is exactly the threshold; strict
    // overlap (start < prev end) means the sessionization merged wrong.
    assert(overlaps == 0)
  }

  test("q45 rollup grand-total row equals orders count") {
    val grand = ExtAggQueries.revenueRollup(spark, sf)
      .filter(col("yr").isNull && col("mo").isNull)
    assert(grand.count() == 1)
    assert(grand.head().getAs[Long]("n") ==
      Tables.load(spark, sf, "orders").count())
  }

  test("q87 bloom filter: no false negatives, absent-key FP rate under gate") {
    val row = graft.queries.ExtAggQueries.bloomMembership(spark, sf).head()
    assert(row.getAs[Long]("n_probes") > 0)
    assert(row.getAs[Boolean]("no_false_negatives"))
    assert(row.getAs[Boolean]("fp_rate_ok"))
  }

  test("q88 count-min sketch: heavy-hitter estimates within one-sided bound") {
    val rows = graft.queries.ExtAggQueries.cmsHeavyHitters(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getAs[Boolean]("within_bound"),
      s"suppkey ${r.getAs[Long]("suppkey")} estimate outside CMS bound"))
  }

  test("q47 approx distinct within 5% of exact") {
    val row = ExtAggQueries.approxDistinctParts(spark, sf).head()
    val exactParts = Tables.load(spark, sf, "lineitem")
      .select("l_partkey").distinct().count()
    assert(row.getAs[Long]("exact_parts") == exactParts)
    assert(row.getAs[Boolean]("parts_within_bound"),
      "HLL parts estimate outside the 5% bound")
    assert(row.getAs[Boolean]("supps_within_bound"),
      "HLL supps estimate outside the 5% bound")
  }
}
