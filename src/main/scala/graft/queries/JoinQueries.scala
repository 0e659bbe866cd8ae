package graft.queries

import graft.Tables
import graft.Tables.sumMoney
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** [EXT] Join surface over the star schema (SURVEY.md §2.5 — the reference
  * has zero joins; the extension adds equi/semi/anti/outer joins so
  * star-schema queries are answerable).
  *
  * Scale notes (100 TB): `nation`/`region` are tiny dims → explicit
  * `broadcast()`, no shuffle. orders⋈customer and lineitem⋈orders are
  * fact⋈fact-sized at scale → shuffle hash/sort-merge on the key, left to
  * Catalyst + AQE (skew split, partition coalescing). Aggregations happen
  * after the join on already-shuffled keys where possible.
  */
object JoinQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Shuffle equi-join orders⋈customer → revenue by market segment. */
  def mktsegmentRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sumMoney(col("o_totalprice")).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  /** 5-table star join: lineitem⋈orders⋈customer⋈nation⋈region →
    * discounted revenue per region. Dims broadcast; facts shuffle. */
  def regionRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    // Partial aggregation below the join (100 TB shape): collapse
    // lineitem (the largest fact) to one exact-decimal row per order
    // BEFORE the join chain, so the orders join shuffles |orders| rows
    // instead of |lineitems|. DECIMAL(18,4): the product of two
    // 2-decimal quantities has ≤4 decimal digits, so the nearest 1e-4
    // grid point is the exact value in both engines, and decimal
    // partial sums re-sum exactly — identical to aggregating after.
    val perOrder = l
      .groupBy(col("l_orderkey"))
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))).as("rev_part"),
        count(lit(1)).as("items_part"))
    perOrder
      .join(o, perOrder("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sum(col("rev_part")).cast("double").as("revenue"),
        sum(col("items_part")).as("n_items"))
      .orderBy(col("r_name"))
  }

  /** Left-semi join (EXISTS): customers that have at least one order,
    * counted per nation. */
  def customersWithOrders(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))
  }

  /** Left-anti join (NOT EXISTS): customers with no order above 450k,
    * per nation (non-empty by data: ~1/3 of customers qualify). */
  def customersWithoutBigOrders(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))
  }

  /** Left-outer join: supplier counts per nation (count(col) skips the
    * null-extended rows, matching ANSI semantics in both engines). */
  def nationSupplierCounts(s: SparkSession, dir: String): DataFrame = {
    val n  = t(s, dir, "nation")
    val su = t(s, dir, "supplier")
    n.join(su, n("n_nationkey") === su("s_nationkey"), "left_outer")
      .groupBy(col("n_name"))
      .agg(count(col("s_suppkey")).as("n_supp"))
      .orderBy(col("n_name"))
  }

  /** Full-outer join: customer presence vs supplier presence per nation
    * key — null-extended sides surface as zero counts via coalesce. */
  def nationCoverage(s: SparkSession, dir: String): DataFrame = {
    val cc = t(s, dir, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val sc = t(s, dir, "supplier")
      .groupBy(col("s_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    cc.join(sc, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** Sorted list aggregation: distinct order statuses per market
    * segment as a comma-joined sorted string (collect_set is
    * partitioning-dependent; array_sort makes it deterministic). */
  def segmentStatusList(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
        .as("statuses"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** Cross join: every region × order-status combination with the
    * status's global order count (explicit crossJoin surface). */
  def regionStatusMatrix(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").select(col("r_name"))
    val sc = t(s, dir, "orders")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n_orders"))
    r.crossJoin(sc)
      .select(col("r_name"), col("o_orderstatus"), col("n_orders"))
      .orderBy(col("r_name"), col("o_orderstatus"))
  }

  /** Join STRATEGY control: the same customer⋈orders aggregate computed
    * under all three physical join strategies via hints — broadcast
    * (dim fits in memory), sort-merge (both sides huge, sort-based),
    * shuffle-hash (both sides huge, build side hashes per partition) —
    * and the results must be identical, which is what the oracle's
    * single joined aggregate cross-joined to the three labels states.
    * JoinStrategySpec asserts each plan really uses its hinted operator.
    * At 100 TB strategy choice is the difference between a 5-second and
    * a 5-hour join; this pins that all three produce the same answer so
    * the choice is purely physical. */
  def joinStrategyHints(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    def agg(strategy: String, hint: String): DataFrame =
      o.join(c.hint(hint), o("o_custkey") === c("c_custkey"))
        .agg(count(lit(1)).as("n"),
          graft.Tables.sumMoney(col("o_totalprice")).as("revenue"))
        .select(lit(strategy).as("strategy"), col("n"), col("revenue"))
    agg("1_broadcast", "broadcast")
      .unionByName(agg("2_merge", "merge"))
      .unionByName(agg("3_shuffle_hash", "shuffle_hash"))
      .orderBy(col("strategy"))
  }

  /** q130: bucket-pruned co-located join — both sides written bucketed
    * by the join key (`bucketBy(8, key)` + in-bucket sort) into a
    * catalog table, then joined THROUGH the catalog. Because bucket
    * layouts match, Catalyst plans the sort-merge join with NO exchange
    * on either side (asserted in ScaleOpsSpec): at 100 TB this is the
    * difference between re-shuffling two fact tables on every join and
    * shuffling each exactly once at write time, amortized over every
    * subsequent join on that key. The aggregate's answer is
    * layout-independent — the oracle restates it from the raw tables. */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame =
    graft.util.Tmp.withTempDir("q130_buckets_") { tmp =>
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      def writeBucketed(df: DataFrame, name: String, key: String): Unit =
        df.write.format("parquet")
          .bucketBy(8, key).sortBy(key)
          .option("path", tmp.resolve(name).toString)
          .mode("overwrite").saveAsTable(name)
      writeBucketed(o, "q130_orders_b", "o_custkey")
      writeBucketed(c, "q130_cust_b", "c_custkey")
      try {
        val res = s.table("q130_orders_b")
          .join(s.table("q130_cust_b"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            sumMoney(col("o_totalprice")).as("revenue"))
          .orderBy(col("c_mktsegment"))
        graft.util.LocalFrame.materialize(res)
      } finally {
        s.sql("DROP TABLE IF EXISTS q130_orders_b")
        s.sql("DROP TABLE IF EXISTS q130_cust_b")
      }
    }

  /** q139: AQE skew-join — the runtime half of the skew story (q72 is
    * the static-salting half). A synthetic hot key maps 80% of lineitem
    * rows to `skew_key = 0`; the join to the 1000-row key→band dim is
    * forced to sort-merge (the dim would otherwise broadcast and hide
    * the skew), and AQE's OptimizeSkewedJoin splits the hot partition
    * into advisory-sized slices at RUNTIME, replicating the matching dim
    * rows (`skew=true` on the SMJ node — asserted in ScaleOpsSpec). At
    * 100 TB this is what saves a fact⋈fact join whose key histogram is
    * only knowable at runtime: no manual salting, no stragglers. The
    * aggressive split thresholds are scoped to this query and restored;
    * the answer is split-invariant, restated plainly by the oracle. */
  def skewJoinAqe(s: SparkSession, dir: String): DataFrame =
    graft.util.LocalFrame.withConfs(s,
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB") {
      graft.util.LocalFrame.materialize(skewJoinFrame(s, dir))
    }

  /** Shared q139 scaffold (also driven by ScaleOpsSpec's skew=true plan
    * assertion, so the evidence describes the oracle-checked query).
    *
    * `preShuffle` lets the spec widen the fact side's map stage: AQE's
    * OptimizeSkewedJoin slices a reduce partition at MAPPER granularity
    * (`splitSizeListByTargetSize` over per-mapper chunk sizes), so a
    * single-row-group test parquet — one map task — leaves nothing to
    * split regardless of thresholds. The bench/oracle path keeps the
    * identity default and its clean single-shuffle plan. */
  private[graft] def skewJoinFrame(
      s: SparkSession, dir: String,
      preShuffle: DataFrame => DataFrame = identity): DataFrame = {
    val l = preShuffle(t(s, dir, "lineitem"))
      .withColumn("skew_key",
        when(pmod(col("l_orderkey"), lit(5)) =!= 0, lit(0L))
          .otherwise(pmod(col("l_orderkey"), lit(1000))))
    val dim = s.range(0, 1000)
      .select(col("id").as("skew_key"), pmod(col("id"), lit(7)).as("band"))
    l.hint("SHUFFLE_MERGE")
      .join(dim, "skew_key")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_items"),
        sumMoney(col("l_extendedprice")).as("revenue"))
      .orderBy(col("band"))
  }

  /** q201: market-basket affinity — brand pairs that co-occur in the
    * same order, with support and lift. The basket relation is the
    * per-order DISTINCT brand set (lineitem ⋈ broadcast part, then a
    * distinct that shrinks ~4 items/order to ≤4 brands/order); pairs
    * come from a self-equi-join on l_orderkey with `<` ordering (each
    * unordered pair once). At scale the self-join is co-partitioned on
    * orderkey (one shuffle shared by both sides) and the per-brand
    * totals broadcast back onto a pair table whose cardinality is
    * bounded by brands² (~600), not by data volume. lift =
    * P(a,b)/(P(a)P(b)) as exact integer products, divided once. */
  def basketBrandLift(s: SparkSession, dir: String): DataFrame = {
    val brands = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct()
    val nOrders = brands.select(col("okey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val brandCounts = brands.groupBy(col("brand"))
      .agg(count(lit(1)).as("n_brand"))
    val pairs = brands.as("a")
      .join(brands.as("b"),
        col("a.okey") === col("b.okey") &&
          col("a.brand") < col("b.brand"))
      .groupBy(col("a.brand").as("brand_a"), col("b.brand").as("brand_b"))
      .agg(count(lit(1)).as("n_co"))
    pairs
      .join(broadcast(brandCounts.withColumnRenamed("brand", "brand_a")
        .withColumnRenamed("n_brand", "n_a")), Seq("brand_a"))
      .join(broadcast(brandCounts.withColumnRenamed("brand", "brand_b")
        .withColumnRenamed("n_brand", "n_b")), Seq("brand_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("brand_a"), col("brand_b"), col("n_co"),
        round(col("n_co").cast("double") / col("n_orders"), 6)
          .as("support"),
        round((col("n_co") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("brand_a"), col("brand_b"))
      .limit(15)
  }

  /** q214: runtime bloom-filter join pruning — the OPTIMIZER-injected
    * twin of q95's hand-built bloom semi-join (ExtAggQueries). With
    * `runtime.bloomFilter.enabled`, InjectRuntimeFilter sees the
    * selective predicate on orders (the creation side), plans a
    * BloomFilterAggregate over its join keys, and rewrites lineitem's
    * side to `might_contain(bloom, xxhash64(key))` — so the fact side drops
    * non-joining rows BEFORE its shuffle write, not after the join. At
    * 100 TB that is the difference between shuffling the whole fact
    * table and shuffling only the ~14% that can join, with nothing
    * hand-maintained: the filter is planned per query at runtime. The
    * application-side scan threshold (default 10 GB — right on a
    * cluster, unreachable at test SF) is scoped to 0, and auto-broadcast
    * is scoped off (at real scale neither side broadcasts; locally the
    * tiny build side would make the rule classify the join as broadcast
    * and — correctly — skip), so the same plan shape materializes at
    * test SF; the `might_contain` predicate on the fact side is asserted
    * in ScaleOpsSpec. */
  def runtimeBloomJoin(s: SparkSession, dir: String): DataFrame =
    graft.util.LocalFrame.withConfs(s,
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      graft.util.LocalFrame.materialize(runtimeBloomFrame(s, dir))
    }

  /** Shared q214 scaffold (also driven by ScaleOpsSpec's plan assertion,
    * so the evidence describes the oracle-checked query). SHUFFLE_MERGE
    * keeps the join a shuffle join — a broadcast join already ships the
    * build side everywhere, so the rule (correctly) would not inject. */
  private[graft] def runtimeBloomFrame(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 150000)
      .select(col("o_orderkey"))
    val l = t(s, dir, "lineitem")
    l.hint("SHUFFLE_MERGE")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        sumMoney(col("l_extendedprice")).as("revenue"))
      .orderBy(col("l_linestatus"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q214_runtime_bloom_join"  -> (runtimeBloomJoin _),
    "q201_basket_lift"        -> (basketBrandLift _),
    "q119_join_strategies"    -> (joinStrategyHints _),
    "q139_skew_join_aqe"      -> (skewJoinAqe _),
    "q130_bucketed_join"      -> (bucketedJoin _),
    "q20_mktsegment_revenue"  -> (mktsegmentRevenue _),
    "q21_region_revenue"      -> (regionRevenue _),
    "q22_semi_customers"      -> (customersWithOrders _),
    "q23_anti_no_big_orders"  -> (customersWithoutBigOrders _),
    "q24_left_supplier_count" -> (nationSupplierCounts _),
    "q75_nation_coverage"     -> (nationCoverage _),
    "q76_segment_status_list" -> (segmentStatusList _),
    "q77_region_status_matrix" -> (regionStatusMatrix _)
  )

  val oracles: Map[String, String] = Map(
    // q214: the runtime bloom filter is physical (it only drops rows that
    // cannot join); the answer is the plain filtered join
    "q214_runtime_bloom_join" ->
      """SELECT l_linestatus, count(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    // q201: identical basket relation and exact integer products; the
    // double division of exact integers is IEEE-identical in both engines
    "q201_basket_lift" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |            FROM lineitem JOIN part ON l_partkey = p_partkey),
        |tot AS (SELECT count(DISTINCT okey) AS n_orders FROM ob),
        |bc AS (SELECT brand, count(*) AS n_brand FROM ob GROUP BY brand),
        |pr AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
        |              count(*) AS n_co
        |       FROM ob a JOIN ob b
        |         ON a.okey = b.okey AND a.brand < b.brand
        |       GROUP BY 1, 2)
        |SELECT brand_a, brand_b, n_co,
        |       round(n_co / CAST(tot.n_orders AS DOUBLE), 6) AS support,
        |       round(CAST(n_co * tot.n_orders AS DOUBLE) /
        |             (ca.n_brand * cb.n_brand), 6) AS lift
        |FROM pr
        |CROSS JOIN tot
        |JOIN bc ca ON pr.brand_a = ca.brand
        |JOIN bc cb ON pr.brand_b = cb.brand
        |ORDER BY lift DESC, brand_a, brand_b LIMIT 15""".stripMargin,
    // AQE partition splitting is physical; the answer is restated as a
    // plain join over the same synthetic key mapping
    "q139_skew_join_aqe" ->
      """WITH li AS (
        |  SELECT CASE WHEN l_orderkey % 5 <> 0 THEN 0
        |              ELSE l_orderkey % 1000 END AS skew_key,
        |         l_extendedprice
        |  FROM lineitem),
        |d AS (SELECT range AS skew_key, range % 7 AS band FROM range(0, 1000))
        |SELECT band, count(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue
        |FROM li JOIN d USING (skew_key)
        |GROUP BY band ORDER BY band""".stripMargin,
    // bucketing is a physical layout; the join answer matches the
    // plain-table join exactly
    "q130_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // one joined aggregate, three strategy labels — physical strategy
    // must not change the answer
    "q119_join_strategies" ->
      """SELECT s.strategy, t.n, t.revenue
        |FROM (VALUES ('1_broadcast'), ('2_merge'), ('3_shuffle_hash'))
        |       s(strategy)
        |CROSS JOIN (
        |  SELECT count(*) AS n,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           AS revenue
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |ORDER BY s.strategy""".stripMargin,
    "q20_mktsegment_revenue" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q75_nation_coverage" ->
      """SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        |       coalesce(n_cust, 0) AS n_cust,
        |       coalesce(n_supp, 0) AS n_supp
        |FROM (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |             count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL JOIN (SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
        |           count(*) AS n_supp FROM supplier GROUP BY 1) s
        |  USING (nationkey)
        |ORDER BY nationkey""".stripMargin,
    "q76_segment_status_list" ->
      """SELECT c_mktsegment,
        |       string_agg(DISTINCT o_orderstatus, ','
        |                  ORDER BY o_orderstatus) AS statuses,
        |       count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q77_region_status_matrix" ->
      """SELECT r_name, o_orderstatus, n_orders
        |FROM region
        |CROSS JOIN (SELECT o_orderstatus, count(*) AS n_orders
        |            FROM orders GROUP BY o_orderstatus) t
        |ORDER BY r_name, o_orderstatus""".stripMargin,
    "q21_region_revenue" ->
      """SELECT r_name,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q22_semi_customers" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "q23_anti_no_big_orders" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "q24_left_supplier_count" ->
      """SELECT n_name, count(s_suppkey) AS n_supp
        |FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin
  )
}
