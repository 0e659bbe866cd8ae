package graft

import graft.ingest.Ingest
import graft.operators.SkewedAgg
import org.apache.spark.sql.functions._

/** Tests for the explicit scale techniques: salted aggregation and
  * bucketed exchange-free joins. */
class ScaleOpsSpec extends SparkSpec {

  test("salted sum equals direct groupBy sum (skew-safe aggregation)") {
    val orders = Tables.load(spark, sf, "orders")
    val direct = orders.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("spend"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = SkewedAgg.saltedSum(orders, "o_custkey",
        col("o_totalprice"), "spend", salts = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, v) =>
      assert(math.abs(v - direct(k)) < 1e-6 * math.max(1.0, math.abs(v)),
        s"key $k: $v vs ${direct(k)}")
    }
  }

  test("partitioned write prunes non-matching partitions at planning time") {
    graft.util.Tmp.withTempDir("scaleops_part_") { tmp =>
      val orders = Tables.load(spark, sf, "orders")
        .withColumn("yr", year(col("o_orderdate")))
      Ingest.savePartitioned(orders, tmp.toString, "yr")
      val pruned = spark.read.parquet(tmp.toString).filter(col("yr") === 1998)
      val scan = pruned.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.getOrElse(fail("no FileSourceScanExec in plan"))
      assert(scan.partitionFilters.nonEmpty,
        "partition filter did not reach the scan")
      // only the matching year's directory is selected — zero I/O
      // against the other years, the point of the layout
      val selected = scan.selectedPartitions
      assert(selected.partitionCount == 1,
        s"expected exactly the yr=1998 partition, got " +
          s"${selected.partitionCount}")
      assert(selected.toPartitionArray.forall(
        _.filePath.toString.contains("yr=1998")),
        "scan selected files outside the yr=1998 partition")
      val expected = orders.filter(year(col("o_orderdate")) === 1998).count()
      assert(pruned.count() == expected)
    }
  }

  test("dim-filtered join dynamically prunes fact partitions at runtime") {
    graft.util.Tmp.withTempDir("scaleops_dpp_") { tmp =>
      // exactly q115's interior join (shared scaffold)
      val joined = graft.queries.MiscQueries
        .dppJoinedFrame(spark, sf, tmp.toString)
      // the pruning predicate on the fact scan is a runtime subquery fed
      // by the dim side — visible as dynamicpruningexpression(...)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n$plan")
      val expected = Tables.load(spark, sf, "orders")
        .filter(year(col("o_orderdate")) >= 1998).count()
      assert(joined.count() == expected)
    }
  }

  test("AQE splits the skewed join partition at runtime (q139's join)") {
    graft.util.LocalFrame.withConfs(spark,
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB") {
      // exactly q139's interior join (shared scaffold); the hot key holds
      // ~80% of lineitem, so under the forced thresholds AQE must split
      // its sort-merge partition — visible as skew=true on the SMJ node.
      // sf0.001's lineitem is one row group = one map task, and AQE can
      // only split at mapper granularity — widen the map stage first.
      val joined = graft.queries.JoinQueries
        .skewJoinFrame(spark, sf, _.repartition(8))
      joined.collect() // AQE re-plans during execution
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in plan:\n$plan")
    }
  }

  test("runtime bloom filter reaches the fact side (q214's join)") {
    graft.util.LocalFrame.withConfs(spark,
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      // exactly q214's interior join (shared scaffold): the selective
      // orders predicate makes orders the creation side, and the
      // injected bloom filter must appear as a might_contain predicate
      // (fed by a bloom_filter_agg scalar subquery over orders) on
      // lineitem's side of the shuffle — rows that cannot join never
      // get shuffled.
      val joined = graft.queries.JoinQueries.runtimeBloomFrame(spark, sf)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter in plan:\n$plan")
      // the filter is pruning-only: the answer matches the plain join
      val expected = graft.util.LocalFrame.withConf(spark,
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false") {
        graft.queries.JoinQueries.runtimeBloomFrame(spark, sf).collect()
      }
      assert(joined.collect().toSeq == expected.toSeq)
    }
  }

  test("join hints select their physical strategies (q119's plans)") {
    val o = Tables.load(spark, sf, "orders")
    val c = Tables.load(spark, sf, "customer")
    def planOf(hint: String): String =
      o.join(c.hint(hint), o("o_custkey") === c("c_custkey"))
        .queryExecution.executedPlan.toString
    assert(planOf("broadcast").contains("BroadcastHashJoin"))
    assert(planOf("merge").contains("SortMergeJoin"))
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"))
  }

  test("ntileFromRank reproduces SQL ntile for every (n % k) shape") {
    // The law the q36/q216 rewrites stand on: bucket-from-(rank, n)
    // arithmetic must equal SQL ntile(k) — including the ANSI
    // larger-buckets-FIRST rule when n % k != 0 (the shape a naive
    // floor(rank*k/n) formula gets wrong, e.g. n=6, k=4).
    import spark.implicits._
    for (k <- Seq(2, 3, 4, 7)) {
      val rows = for { n <- 1 to 30; i <- 1 to n } yield (n.toLong, i.toLong)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("n")).orderBy(col("i"))
      val bad = rows.toDF("n", "i")
        .withColumn("want", ntile(k).over(w).cast("long"))
        .withColumn("got",
          graft.operators.GlobalRank.ntileFromRank(col("i"), col("n"), k))
        .filter(col("want") =!= col("got"))
      assert(bad.isEmpty,
        s"k=$k mismatches: ${bad.collect().mkString(", ")}")
    }
  }

  test("GlobalRank validate flag rejects a tied order key") {
    import spark.implicits._
    spark.conf.set("graft.globalRank.validate", "true")
    try {
      val tied = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
      val err = intercept[IllegalArgumentException] {
        graft.operators.GlobalRank.withGlobalRank(tied, "k", "rank").count()
      }
      assert(err.getMessage.contains("not a total order"))
      // a genuinely unique key passes under the same flag
      val ok = graft.operators.GlobalRank
        .withGlobalRank(tied, Seq(col("v").desc, col("k")), "rank")
      assert(ok.count() == 3)
    } finally spark.conf.unset("graft.globalRank.validate")
  }

  test("q69 order bounds is one aggregate, not window + distinct") {
    // Round-6 ask #4: q69 drifted 0.34 s -> 0.77 s with unchanged code.
    // The fix is a better plan, not a tuning knob: the window form paid
    // a partition shuffle plus a full-frame distinct shuffle; the
    // rewrite is a single partial-aggregated groupBy. Pin the shape.
    val df = graft.queries.MiscQueries.orderBounds(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q69 regressed to a window:\n$plan")
    assert(
      plan.linesIterator.count(_.trim.startsWith("+- Exchange")) <= 2,
      s"q69 shuffles more than agg+sort:\n$plan")
    assert(df.count() > 0)
  }

  test("no unpartitioned Window survives in q36/q206/q216 plans") {
    // Round-6 verdict: these three shipped `Window.orderBy` with no
    // partition spec — a single-task funnel over a data-proportional
    // frame. They now ride GlobalRank's range-exchange + zipWithIndex
    // enumeration; pin the shape so the window can't creep back.
    val targets: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "q36" -> graft.queries.WindowQueries.spendQuartiles(spark, sf),
      "q206" -> graft.queries.MiscQueries.keySkewProfile(spark, sf),
      "q216" -> graft.queries.TextQueries.pplBuckets(spark, sf))
    for ((name, df) <- targets) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name has a Window stage again:\n$plan")
      assert(plan.contains("ExistingRDD"),
        s"$name lost the two-pass enumeration scan:\n$plan")
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    Ingest.saveBucketed(orders, "orders_b", "o_custkey", 4)
    Ingest.saveBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b", "o_custkey", 4)
    try {
      // disable auto-broadcast so the join would otherwise shuffle
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("orders_b")
          .join(spark.table("customer_b"), "o_custkey")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$plan")
        assert(joined.count() == orders.count())
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
    } finally {
      Ingest.dropTable(spark, "orders_b")
      Ingest.dropTable(spark, "customer_b")
    }
  }
}
