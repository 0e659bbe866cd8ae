package graft

import graft.queries._
import org.apache.spark.sql.functions._

/** Invariants for the product-analytics / ops operators (q198-q213)
  * beyond their DuckDB oracles: the properties that must survive ANY
  * partitioning — the distributed-correctness contract the oracle
  * (which runs single-threaded) cannot itself witness.
  */
class AnalyticsOpsSpec extends SparkSpec {

  test("q207 checksums are partition-invariant (order-insensitive SUM)") {
    // the whole point of the reconciliation checksum: any engine, any
    // parallelism, same number. Recompute the orders checksum from a
    // deliberately different partitioning and require bit equality.
    val base = MiscQueries.tableChecksums(spark, sf)
      .filter(col("table_name") === "orders").head()
    val reparted = Tables.load(spark, sf, "orders").repartition(13)
    val alt = reparted.agg(
      sum(conv(substring(md5(concat_ws("|", col("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          .cast("string"),
        date_format(col("o_orderdate"), "yyyy-MM-dd"),
        col("o_orderpriority"))), 1, 8), 16, 10).cast("long"))).head()
    assert(base.getLong(2) == alt.getLong(0))
  }

  test("q198 funnel narrows monotonically") {
    val r = EventQueries.funnelStages(spark, sf).head()
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p)
  }

  test("q199 cohort week-0 retention is exactly 1.0, ratios in (0,1]") {
    val df = EventQueries.retentionCohorts(spark, sf)
    assert(df.filter(col("offset_weeks") === 0 &&
      col("retention") =!= 1.0).count() == 0)
    assert(df.filter(col("retention") <= 0 ||
      col("retention") > 1.0).count() == 0)
  }

  test("q199 cohort sizes partition the user base") {
    val cohortTotal = EventQueries.retentionCohorts(spark, sf)
      .filter(col("offset_weeks") === 0)
      .agg(sum("cohort_size")).head().getLong(0)
    val users = Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(cohortTotal == users)
  }

  test("q211 transition probabilities sum to 1 per from_type") {
    val sums = EventQueries.eventTransitions(spark, sf)
      .groupBy("from_type").agg(sum("p").as("total"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4,
      s"${r.getString(0)} sums to ${r.getDouble(1)}"))
  }

  test("q206 gini and shares are sane bounds") {
    val r = MiscQueries.keySkewProfile(spark, sf).head()
    val gini = r.getDouble(4)
    assert(gini >= 0.0 && gini < 1.0)
    assert(r.getDouble(2) <= r.getDouble(3)) // top1 <= top10 share
  }

  test("q210 exactly one survivor per component, and it is a longest") {
    val df = TextQueries.qualitySurvivors(spark, sf).cache()
    try {
      val perComp = df.groupBy("component")
        .agg(sum(when(col("is_survivor"), 1L).otherwise(0L)).as("n_surv"),
          max(col("n_tokens")).as("max_tok"),
          max(when(col("is_survivor"), col("n_tokens"))).as("surv_tok"))
      assert(perComp.filter(col("n_surv") =!= 1L).count() == 0)
      assert(perComp.filter(col("surv_tok") =!= col("max_tok")).count() == 0)
    } finally df.unpersist()
  }

  test("q226 NDV estimates: exact on FK joins, under on the skewed self-join") {
    val rows = graft.queries.MiscQueries.joinCardEst(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows("lineitem_orders") == 1.0, s"FK ratio drifted: $rows")
    assert(rows("orders_customer") == 1.0, s"FK ratio drifted: $rows")
    assert(rows("documents_lang_self") < 1.0,
      s"skewed key must under-estimate: $rows")
  }

  test("q225 k-anonymity: published events never exceed the total") {
    val rows = EventQueries.kAnonymity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"suppressed > cells in $r")
      val frac = r.getDouble(3)
      assert(frac >= 0.0 && frac <= 1.0)
    }
    val published = rows.map(_.getLong(4)).sum
    val total = Tables.load(spark, sf, "events").count()
    assert(published <= total, "published events exceed the corpus")
  }

  test("q209 date spine is gapless and conserves events") {
    val df = EventQueries.dateSpine(spark, sf).cache()
    try {
      val n = df.count()
      val span = df.agg(min("day"), max("day")).head()
      val d0 = java.time.LocalDate.parse(span.getString(0))
      val d1 = java.time.LocalDate.parse(span.getString(1))
      assert(n == java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1)
      val total = df.agg(sum("n_events")).head().getLong(0)
      assert(total == Tables.load(spark, sf, "events").count())
    } finally df.unpersist()
  }
}
