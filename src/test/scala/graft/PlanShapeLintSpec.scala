package graft

import graft.plans.PlanLint
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[graft.plans.PlanLint]] — the scale-shape gate. Round 6 shipped
  * three single-partition global windows that every audit before had to
  * find by hand; this spec makes the shape a build failure instead.
  *
  * Findings are only legal inside [[allow]], where each entry carries
  * the justification an audit would demand. The justification is always
  * the same theorem: the flagged operator's input frame is BOUNDED (a
  * dim table, a value domain, a calendar) — it does not grow with the
  * data, so one task never sees a data-proportional frame.
  */
class PlanShapeLintSpec extends SparkSpec {

  /** query name → why its flagged shape survives 100× data growth. */
  private val allow: Map[String, String] = Map(
    "q33_nation_revenue_rank" ->
      "rank over the 25-row nation revenue aggregate — dim-bounded frame",
    "q102_sql_nation_rank" ->
      "same dim-bounded nation aggregate, SQL-surface twin of q33",
    "q81_clv_segments" ->
      "cumulative share over visit BANDS — bounded band domain, not rows",
    "q213_decline_alerts" ->
      "lag over calendar MONTHS — bounded by the calendar, not rows",
    "q227_distribution_drift" ->
      "cumulative CDF over the distinct-VALUE domain (bounded), not rows",
    "q306_stratified_sample" ->
      ("Hamilton seat-allocation window over the source-VOCABULARY " +
        "strata frame (one row per source, bounded like q33's dims); " +
        "the data-sized selection pass is partitioned by source"),
    "q307_temperature_mixture" ->
      ("the same vocab-bounded strata frame as q306 — √n weights and " +
        "seat ranks computed over one row per source, never per doc"),
    "q63_embed_top_pairs_lsh" ->
      ("rank-order check over the broadcast top-20 pair list — the " +
        "window input is .limit(20)-bounded upstream, 20 rows forever"),
    // unbounded-collect adjudications: each collected group is bounded
    // by a value domain, a single row's own size, or an explicit df cap
    "q69_order_bounds" ->
      ("collect of ONE customer's orders — per-key constant of the " +
        "generator (orders/customer does not grow with SF)"),
    "q76_segment_status_list" ->
      "collect_set over the order-status VALUE DOMAIN ({F,O,P}) — bounded",
    "q78_status_maps" ->
      "collect over per-priority status counts — status domain bounded",
    "q125_dedup_repetition" ->
      ("collect of one DOCUMENT's distinct words — bounded by that " +
        "doc's own length, per-row not corpus-proportional state"),
    "q196_inverted_index" ->
      ("postings collected only for the two PROBE terms (filter pushed " +
        "below the aggregate) — bounded by probe df, the working set a " +
        "segmented production index reads for the same conjunction"),
    // q231 is deliberately ABSENT: its bucket build is banded_collect
    // (BandedCollectAgg) — a hot gram kills its own buffer at the 51st
    // distinct doc, so the unbounded-collect shape no longer exists in
    // its plan at all
    "q240_sparse_dot_pairs" ->
      ("df-band pre-join (df BETWEEN 2 AND 50) caps every collected " +
        "posting list at 50 docs before the aggregate sees it"),
    "q263_ses_forecast" ->
      ("collect of one nation's MONTHLY revenue series — bounded by " +
        "the calendar span (~84 months), not by row count; the SES " +
        "fold is per-group O(months)"),
    "q299_kaplan_meier" ->
      ("collect of the per-DURATION event/censor counts — durations " +
        "are lifetime MONTHS, bounded by the calendar span (~84), " +
        "never by customer count; the KM product-limit fold is one " +
        "aggregate HOF over that bounded array"),
    "q279_cusum_alerts" ->
      ("the same calendar-bounded monthly series as q263 (≤ ~84 " +
        "entries at any SF); the CUSUM recurrence folds per group in " +
        "one aggregate HOF, driver holds nothing"),
    "q325_acf_ljung_box" ->
      ("lag and cumulative triangle joins over the calendar-bounded " +
        "monthly frame (≤ ~84 rows at any SF, then 6 lag rows) — the " +
        "q309 pair-enumeration class; the only data-sized job is the " +
        "monthly hash aggregate"))

  test("lint flags deliberately-bad fixtures") {
    import spark.implicits._
    // 1. the q36-shape: global window, no partition spec
    val win = (1 to 100).toDF("x")
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    assert(PlanLint.lint(win).exists(_.kind == "global-window"),
      "unpartitioned window not flagged")
    // 2. a real cartesian product (not a broadcast scalar join)
    graft.util.LocalFrame.withConf(spark,
      "spark.sql.autoBroadcastJoinThreshold", "-1") {
      val cross = (1 to 50).toDF("a").crossJoin((1 to 50).toDF("b"))
      assert(PlanLint.lint(cross).exists(_.kind == "cartesian-product"),
        "cartesian product not flagged")
    }
    // 3. explicit funnel into one partition of un-aggregated rows
    val rep = (1 to 100).toDF("x").repartition(1)
      .withColumn("y", col("x") * 2)
    assert(PlanLint.lint(rep).exists(_.kind == "single-partition-exchange"),
      "repartition(1) funnel not flagged")
    // 4. the df-band-less bucket-explode shape: a whole group as one
    // aggregation buffer (the q231/q240 failure mode when the cap is
    // missing — one hot key OOMs its task at scale)
    val clst = (1 to 100).toDF("x").withColumn("k", col("x") % 3)
      .groupBy(col("k")).agg(collect_list(col("x")).as("xs"))
    assert(PlanLint.lint(clst).exists(_.kind == "unbounded-collect"),
      "unbanded collect_list not flagged")
    val cset = (1 to 100).toDF("x").withColumn("k", col("x") % 3)
      .groupBy(col("k")).agg(collect_set(col("x")).as("xs"))
    assert(PlanLint.lint(cset).exists(_.kind == "unbounded-collect"),
      "unbanded collect_set not flagged")
    // and the legitimate shapes stay silent
    val agg = (1 to 100).toDF("x").agg(sum(col("x")).as("s"))
    assert(PlanLint.lint(agg).isEmpty, "1-row global agg wrongly flagged")
    val sorted = (1 to 100).toDF("x").orderBy(col("x"))
    assert(!PlanLint.lint(sorted).exists(_.kind == "single-partition-exchange"),
      "global range sort wrongly flagged")
  }

  test("no unadjudicated scale-killer shapes across the query surface") {
    val stale = allow.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"allowlist names unknown queries: $stale")
    val bad = scala.collection.mutable.SortedMap.empty[String, String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val findings =
        try PlanLint.lint(fn(spark, sf))
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
      if (findings.nonEmpty && !allow.contains(name))
        bad(name) = findings.mkString("; ")
      if (findings.isEmpty && allow.contains(name))
        bad(name) = "allowlisted but clean — remove the stale entry"
    }
    assert(bad.isEmpty, "\n" + bad.map { case (n, f) => s"  $n: $f" }
      .mkString("\n"))
  }
}
