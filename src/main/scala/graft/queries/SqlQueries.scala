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

  /** The sketch aggregates through the PARSER path: `bloom_agg` /
    * `bloom_might_contain` registered as SQL functions
    * (GraftFunctions/GraftExtensions), per-nation filters built in SQL,
    * probed by a bounded 100-row probe list (top customers by balance —
    * a deterministic total order). Members always hit (no false
    * negatives); shifted keys (+1e9, guaranteed absent) gate the FP count
    * at 10/100 vs the ~0.03% actual rate of a 20k-sized filter holding
    * ≤6k keys. */
  def sqlBloomProbe(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val customer = view(s, dir, "customer")
    s.sql(
      s"""WITH blooms AS (
         |  SELECT c_nationkey AS nk, bloom_agg(c_custkey, 20000, 0.01) AS bf
         |  FROM $customer GROUP BY c_nationkey),
         |top_cust AS (
         |  SELECT c_custkey, c_nationkey FROM $customer
         |  ORDER BY c_acctbal DESC, c_custkey LIMIT 100)
         |SELECT count(*) AS n_probes,
         |       every(bloom_might_contain(bf, c_custkey)) AS all_present,
         |       count_if(bloom_might_contain(bf, c_custkey + 1000000000))
         |         <= 10 AS fp_ok
         |FROM top_cust JOIN blooms ON c_nationkey = nk""".stripMargin)
  }

  /** `cms_agg` / `cms_estimate` through the parser: one global sketch as
    * a scalar-subquery-style CTE crossed with the exact top-10 orderers.
    * Estimates never undercount; overcount gated at 2× eps·N (+8). */
  def sqlCmsProbe(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val orders = view(s, dir, "orders")
    s.sql(
      s"""WITH sk AS (
         |  SELECT cms_agg(o_custkey, 5, 8192, 42) AS s, count(*) AS total
         |  FROM $orders),
         |hh AS (
         |  SELECT o_custkey, count(*) AS exact_n FROM $orders
         |  GROUP BY o_custkey ORDER BY exact_n DESC, o_custkey LIMIT 10)
         |SELECT o_custkey, exact_n,
         |       cms_estimate(s, o_custkey) >= exact_n AS no_underest,
         |       cms_estimate(s, o_custkey) <= exact_n +
         |         CAST(ceil(total * 4.0 / 8192) AS BIGINT) + 8 AS within_slack
         |FROM hh CROSS JOIN sk ORDER BY exact_n DESC, o_custkey""".stripMargin)
  }

  /** Parameterized SQL (Spark 4 named parameter markers): the statement
    * text carries `:yr` / `:cap` placeholders and the values arrive as a
    * typed arg map — the injection-safe way to template the reference's
    * dashboard queries (vs. string interpolation). Parameters bind in
    * the parser, so the plan is identical to the literal query, which is
    * exactly what the oracle restates with literals. */
  def sqlParameterized(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql(
      s"""SELECT o_orderpriority, count(*) AS n,
         |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |         AS revenue
         |FROM $orders
         |WHERE year(o_orderdate) = :yr AND o_totalprice < :cap
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      Map("yr" -> 1997, "cap" -> 200000))
  }

  /** SQL session variables (Spark 4 `DECLARE` / `SET VAR`): the
    * variable is computed BY a query (the 90th-percentile price), then
    * referenced by a later statement — the scripting idiom for threading
    * a scalar between statements without driver-side string splicing.
    * The oracle inlines the variable's defining subquery. */
  def sqlSessionVariables(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql("DECLARE OR REPLACE VARIABLE price_p90 DOUBLE")
    s.sql(s"SET VAR price_p90 = (SELECT percentile(o_totalprice, 0.9) FROM $orders)")
    s.sql(
      s"""SELECT o_orderstatus, count(*) AS n_above
         |FROM $orders WHERE o_totalprice > price_p90
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** q137: near-dup connected components as a RECURSIVE CTE through the
    * SQL parser — the declarative twin of q109's iterative min-label
    * DataFrame loop (edges from the same banded-LSH pair list, bridged
    * via temp view; S9). Spark recursion only supports UNION ALL, so the
    * walk is made finite two ways: labels only propagate DOWNHILL
    * (`r.lbl < e.dst` — the min label still reaches every member, since
    * every non-min node exceeds it) and a depth bound of 6 (near-dup
    * components are near-cliques of tiny diameter; sizes are ≤4 at every
    * test SF). MIN(lbl) per node then collapses duplicate walks. The
    * oracle is q109's exact-Jaccard recursive CTE, so this also pins
    * "LSH pair list ≡ exact pair list" a second way. Scale note: the
    * recursion materializes walks, not reachability — the DataFrame
    * min-label loop (q109) stays the 100 TB path; this is the
    * parser-surface form. */
  def sqlNeardupComponents(s: SparkSession, dir: String): DataFrame = {
    // materialized: the recursive CTE below re-reads this view in EVERY
    // iteration (plus the UNION in `e` and the seed in `n`), and a lazy
    // temp view would re-run the whole shingle/minhash/LSH pipeline each
    // time — ~10× the work. The shared per-dataset pair cache replays
    // the tiny verified list as a LocalRelation (bounded by the near-dup
    // count, not the corpus): free to re-scan each recursive step, no
    // executor blocks to leak across repeated bench/verify runs, and
    // bit-identical to q55/q109/q138's edge list.
    TextQueries.lshNearDupPairs(s, dir)
      .createOrReplaceTempView("sqlq_neardup_pairs")
    s.sql(
      """WITH RECURSIVE
        |e AS (SELECT id_a AS src, id_b AS dst FROM sqlq_neardup_pairs
        |      UNION SELECT id_b, id_a FROM sqlq_neardup_pairs),
        |n AS (SELECT DISTINCT src AS id FROM e),
        |reach(id, lbl, d) AS (
        |  SELECT id, id, 0 FROM n
        |  UNION ALL
        |  SELECT e.dst, r.lbl, r.d + 1
        |  FROM reach r JOIN e ON e.src = r.id
        |  WHERE r.lbl < e.dst AND r.d < 6),
        |comp AS (SELECT id AS doc_id, min(lbl) AS component
        |         FROM reach GROUP BY id)
        |SELECT doc_id, component,
        |       count(*) OVER (PARTITION BY component) AS n_docs
        |FROM comp ORDER BY doc_id""".stripMargin)
  }

  /** Correlated LATERAL subquery (Spark ≥3.4 / standard SQL): per
    * nation, the top customer by account balance via an ORDER BY +
    * LIMIT 1 subquery correlated on the outer row — the "top-1 detail
    * per group" idiom a notebook user writes instead of a window rank.
    * Catalyst decorrelates it to a ranked join (same plan family as
    * q30); DuckDB runs the identical statement, so the oracle is
    * word-for-word. */
  def sqlLateralTopCustomer(s: SparkSession, dir: String): DataFrame = {
    val nation = view(s, dir, "nation")
    val customer = view(s, dir, "customer")
    s.sql(
      s"""SELECT n.n_name, t.c_custkey, t.bal
         |FROM $nation n,
         |LATERAL (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal
         |         FROM $customer c
         |         WHERE c.c_nationkey = n.n_nationkey
         |         ORDER BY c_acctbal DESC, c_custkey LIMIT 1) t
         |ORDER BY n.n_name""".stripMargin)
  }

  /** SQL pipe syntax (Spark 4 `|>`): q99's dashboard segmentation as a
    * linear EXTEND → AGGREGATE → ORDER BY pipeline — the notebook-
    * friendly form Spark 4 added for exactly this kind of staged
    * transform. Parses to the same plan as the nested form, so q06's
    * oracle is reused verbatim. */
  def sqlPipeSegments(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql(
      s"""FROM $orders
         ||> EXTEND CASE WHEN o_totalprice <= 50000 THEN '1_small'
         |          WHEN o_totalprice <= 150000 THEN '2_medium'
         |          WHEN o_totalprice <= 300000 THEN '3_large'
         |          ELSE '4_xlarge' END AS segment
         ||> AGGREGATE count(*) AS n,
         |     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |       AS revenue
         |   GROUP BY segment
         ||> ORDER BY segment""".stripMargin)
  }

  /** SQL-defined scalar function (Spark 4 `CREATE FUNCTION … RETURN
    * <expr>`): the q06 banding rule declared ONCE as a catalog-level
    * function and reused by the dashboard query — the governed way to
    * share business logic across notebook queries (vs copy-pasted CASE
    * blocks). The body is inlined by the analyzer, so the plan — and
    * the oracle — are exactly q06's. */
  def sqlScalarUdf(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION order_band(p DOUBLE)
        |RETURNS STRING
        |RETURN CASE WHEN p <= 50000 THEN '1_small'
        |            WHEN p <= 150000 THEN '2_medium'
        |            WHEN p <= 300000 THEN '3_large'
        |            ELSE '4_xlarge' END""".stripMargin)
    s.sql(
      s"""SELECT order_band(o_totalprice) AS segment, count(*) AS n,
         |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |         AS revenue
         |FROM $orders GROUP BY segment ORDER BY segment""".stripMargin)
  }

  /** SQL-defined TABLE function (`CREATE FUNCTION … RETURNS TABLE …`):
    * a parameterized relation — big orders above a threshold — consumed
    * like any table and joined downstream. The parameter reaches the
    * body's WHERE (a correlated outer reference the analyzer inlines);
    * the oracle restates the call with the argument substituted. */
  def sqlTableUdf(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION big_orders(threshold DOUBLE)
         |RETURNS TABLE(o_custkey BIGINT, o_totalprice DOUBLE)
         |RETURN SELECT o_custkey, CAST(o_totalprice AS DOUBLE)
         |       FROM $orders WHERE o_totalprice > threshold""".stripMargin)
    s.sql(
      """SELECT o_custkey, count(*) AS n_big,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS big_revenue
        |FROM big_orders(400000)
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
  }

  /** `EXECUTE IMMEDIATE` with a `USING` parameter (Spark 4 dynamic
    * SQL): the statement text is data, the argument binds at execution
    * — the scripting escape hatch for generated dashboards. The oracle
    * restates the statement with the literal substituted. */
  def sqlExecuteImmediate(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql(
      s"""EXECUTE IMMEDIATE
         |'SELECT o_orderpriority, count(*) AS n FROM $orders
         | WHERE o_totalprice > ? GROUP BY o_orderpriority
         | ORDER BY o_orderpriority'
         |USING 300000""".stripMargin)
  }

  /** `GROUP BY ALL` / `ORDER BY ALL` (Spark 4, after DuckDB's lead):
    * every non-aggregate select item becomes a grouping/ordering key —
    * the exploratory-SQL shorthand. DuckDB runs the identical
    * statement, so the oracle is word-for-word. */
  def sqlGroupByAll(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql(
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |         AS revenue
         |FROM $orders GROUP BY ALL ORDER BY ALL""".stripMargin)
  }

  /** `IDENTIFIER(:param)` (Spark 4): a table name supplied as a BOUND
    * PARAMETER instead of string-spliced SQL — the injection-safe form
    * of dynamic object references. Resolves to the plain query the
    * oracle restates. */
  def sqlIdentifierClause(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql(
      """SELECT o_orderstatus, count(*) AS n
        |FROM IDENTIFIER(:tab)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      Map("tab" -> orders))
  }

  /** q161: SQL scripting (Spark 4 `BEGIN … END` compound statements —
    * DECLARE'd variables, a WHILE loop, SET accumulation): the
    * procedural surface warehouse migrations expect. The script walks
    * four escalating price thresholds (fractions of the max), summing
    * the above-threshold counts into a variable; the loop is genuinely
    * iterative in the engine, but every iteration is a closed-form
    * scalar, so the oracle restates the whole script as one relational
    * expression. Control flow runs on the DRIVER over tiny scalars —
    * each inner SELECT is still a full distributed plan, so the shape
    * scales like any aggregate. */
  def sqlScripting(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    graft.util.LocalFrame.withConfs(s,
      "spark.sql.scripting.enabled" -> "true") {
      graft.util.LocalFrame.materialize(s.sql(
        s"""BEGIN
           |  DECLARE hi DOUBLE;
           |  DECLARE i INT DEFAULT 1;
           |  DECLARE acc BIGINT DEFAULT 0;
           |  SET hi = (SELECT max(o_totalprice) FROM $orders);
           |  WHILE i <= 4 DO
           |    SET acc = acc +
           |      (SELECT count(*) FROM $orders
           |       WHERE o_totalprice > hi * i / 5.0);
           |    SET i = i + 1;
           |  END WHILE;
           |  SELECT acc AS n_cumulative,
           |         CAST((SELECT count(*) FROM $orders
           |               WHERE o_totalprice > hi / 2.0) AS BIGINT)
           |           AS n_above_half;
           |END""".stripMargin))
    }
  }

  /** q167: the SQL `PIVOT` clause (vs q34's DataFrame `.pivot`): order
    * counts by year × status as columns, through the parser. The
    * oracle restates with conditional aggregation — the relational
    * form PIVOT desugars to on both engines. */
  def sqlPivot(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql(
      s"""SELECT * FROM (
         |  SELECT year(o_orderdate) AS yr, o_orderstatus FROM $orders)
         |PIVOT (count(*) AS n FOR o_orderstatus IN ('F', 'O', 'P'))
         |ORDER BY yr""".stripMargin)
      .selectExpr("CAST(yr AS BIGINT) AS yr",
        "coalesce(F, 0) AS F", "coalesce(O, 0) AS O",
        "coalesce(P, 0) AS P")
  }

  /** q168: the SQL `UNPIVOT` clause (vs q37's `stack()`): two part
    * metrics into (metric, value) rows through the parser, aggregated
    * per brand × metric. */
  def sqlUnpivot(s: SparkSession, dir: String): DataFrame = {
    val part = view(s, dir, "part")
    s.sql(
      s"""SELECT p_brand, metric, count(*) AS n,
         |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         |         AS total
         |FROM (
         |  SELECT p_brand, metric, value FROM (
         |    SELECT p_brand,
         |           CAST(p_retailprice AS DECIMAL(18,2)) AS retailprice,
         |           CAST(p_size AS DECIMAL(18,2)) AS size
         |    FROM $part)
         |  UNPIVOT (value FOR metric IN (retailprice, size)))
         |GROUP BY p_brand, metric
         |ORDER BY p_brand, metric""".stripMargin)
  }

  /** q170: partitioning-control SQL — `DISTRIBUTE BY` (hash exchange on
    * the named key, the ETL idiom for controlling output layout) under
    * an `/*+ REBALANCE */` hint variant, wrapped in an outer aggregate
    * so the answer is partitioning-invariant and the oracle restates it
    * relationally. The clauses change the EXCHANGES, not the rows —
    * which is exactly what the oracle equality pins. */
  def sqlDistributeBy(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql(
      s"""SELECT o_orderstatus, count(*) AS n,
         |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |         AS revenue
         |FROM (
         |  SELECT /*+ REBALANCE(o_orderstatus) */ o_orderstatus,
         |         o_totalprice
         |  FROM (SELECT o_orderstatus, o_totalprice FROM $orders
         |        DISTRIBUTE BY o_orderstatus))
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** q172: string collations (Spark 4 `COLLATE UTF8_LCASE`) — grouping
    * merges case variants under the collation while aggregates over the
    * raw column stay binary, so the representative (`min`, binary
    * order) and the variant count are deterministic. A parity-keyed
    * case flip manufactures the mixed-case data; the oracle restates
    * the collation as `lower()` grouping. */
  def sqlCollation(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql(
      s"""WITH t AS (
         |  SELECT CASE WHEN o_orderkey % 2 = 0
         |              THEN upper(o_orderpriority)
         |              ELSE lower(o_orderpriority) END AS pr
         |  FROM $orders)
         |SELECT min(pr) AS repr, count(*) AS n,
         |       count(DISTINCT pr) AS n_variants
         |FROM t GROUP BY pr COLLATE UTF8_LCASE
         |ORDER BY repr""".stripMargin)
  }

  /** q173: Hive-style `LATERAL VIEW` generators through the parser —
    * `explode` over the tokenized part type plus `posexplode` keeping
    * ordinals; the modern LATERAL/`explode()`-in-FROM forms are q145/
    * q149's territory, this is the legacy spelling ETL code ships. */
  def sqlLateralView(s: SparkSession, dir: String): DataFrame = {
    val part = view(s, dir, "part")
    s.sql(
      s"""SELECT tok, count(*) AS n,
         |       CAST(min(pos) AS BIGINT) AS first_pos
         |FROM $part
         |LATERAL VIEW posexplode(split(p_type, ' ')) x AS pos, tok
         |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin)
  }

  /** q174: null-safe equality join (`<=>`): NULL keys match each other
    * (one join row per order even for the nulled-out priority class),
    * which a plain equi-join drops. DuckDB spells the same operator
    * `IS NOT DISTINCT FROM`. */
  def sqlNullSafeJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = view(s, dir, "orders")
    s.sql(
      s"""WITH f AS (
         |  SELECT nullif(o_orderpriority, '1-URGENT') AS pr,
         |         o_totalprice
         |  FROM $orders),
         |d AS (SELECT DISTINCT pr FROM f)
         |SELECT coalesce(d.pr, '<null>') AS pr, count(*) AS n,
         |       CAST(sum(CAST(f.o_totalprice AS DECIMAL(18,2)))
         |            AS DOUBLE) AS revenue
         |FROM f JOIN d ON f.pr <=> d.pr
         |GROUP BY d.pr ORDER BY pr""".stripMargin)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q161_sql_scripting"      -> (sqlScripting _),
    "q172_sql_collation"      -> (sqlCollation _),
    "q173_sql_lateral_view"   -> (sqlLateralView _),
    "q174_sql_nullsafe_join"  -> (sqlNullSafeJoin _),
    "q170_sql_distribute_by"  -> (sqlDistributeBy _),
    "q167_sql_pivot"          -> (sqlPivot _),
    "q168_sql_unpivot"        -> (sqlUnpivot _),
    "q137_sql_components"     -> (sqlNeardupComponents _),
    "q148_sql_scalar_udf"     -> (sqlScalarUdf _),
    "q153_sql_group_by_all"   -> (sqlGroupByAll _),
    "q154_sql_identifier"     -> (sqlIdentifierClause _),
    "q149_sql_table_udf"      -> (sqlTableUdf _),
    "q150_sql_exec_immediate" -> (sqlExecuteImmediate _),
    "q145_sql_lateral_topcust" -> (sqlLateralTopCustomer _),
    "q146_sql_pipe_segments"  -> (sqlPipeSegments _),
    "q120_sql_parameterized"  -> (sqlParameterized _),
    "q121_sql_session_vars"   -> (sqlSessionVariables _),
    "q99_sql_order_segments"  -> (sqlOrderSegments _),
    "q100_sql_rfm_view_chain" -> (sqlRfmViewChain _),
    "q101_sql_revenue_rollup" -> (sqlRevenueRollup _),
    "q102_sql_nation_rank"    -> (sqlNationRevenueRank _),
    "q105_sql_bloom_probe"    -> (sqlBloomProbe _),
    "q106_sql_cms_probe"      -> (sqlCmsProbe _)
  )

  /** Same results as the DataFrame twins → the twins' oracles verbatim. */
  val oracles: Map[String, String] = Map(
    // q109's exact-Jaccard recursive-CTE oracle, reused verbatim: the
    // SQL-parser components must match the exact component structure
    "q137_sql_components" ->
      graft.queries.TextQueries.oracles("q109_neardup_components"),
    // the collation restated as lower() grouping
    "q172_sql_collation" ->
      """WITH t AS (
        |  SELECT CASE WHEN o_orderkey % 2 = 0
        |              THEN upper(o_orderpriority)
        |              ELSE lower(o_orderpriority) END AS pr
        |  FROM orders)
        |SELECT min(pr) AS repr, count(*) AS n,
        |       count(DISTINCT pr) AS n_variants
        |FROM t GROUP BY lower(pr)
        |ORDER BY repr""".stripMargin,
    // LATERAL VIEW posexplode as DuckDB's zipped parallel unnests
    "q173_sql_lateral_view" ->
      """WITH t AS (SELECT string_split(p_type, ' ') AS ws FROM part),
        |x AS (SELECT unnest(ws) AS tok,
        |             unnest(range(len(ws))) AS pos FROM t)
        |SELECT tok, count(*) AS n, CAST(min(pos) AS BIGINT) AS first_pos
        |FROM x GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin,
    // <=> is IS NOT DISTINCT FROM
    "q174_sql_nullsafe_join" ->
      """WITH f AS (
        |  SELECT nullif(o_orderpriority, '1-URGENT') AS pr, o_totalprice
        |  FROM orders),
        |d AS (SELECT DISTINCT pr FROM f)
        |SELECT coalesce(d.pr, '<null>') AS pr, count(*) AS n,
        |       CAST(sum(CAST(f.o_totalprice AS DECIMAL(18,2)))
        |            AS DOUBLE) AS revenue
        |FROM f JOIN d ON f.pr IS NOT DISTINCT FROM d.pr
        |GROUP BY d.pr ORDER BY pr""".stripMargin,
    // the partitioning clauses change exchanges, not rows
    "q170_sql_distribute_by" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // PIVOT desugared to conditional aggregation
    "q167_sql_pivot" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
        |       count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
        |       count(*) FILTER (WHERE o_orderstatus = 'P') AS P
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,
    // UNPIVOT restated as a stacked UNION
    "q168_sql_unpivot" ->
      """WITH u AS (
        |  SELECT p_brand, 'retailprice' AS metric,
        |         CAST(p_retailprice AS DECIMAL(18,2)) AS value FROM part
        |  UNION ALL
        |  SELECT p_brand, 'size',
        |         CAST(p_size AS DECIMAL(18,2)) FROM part)
        |SELECT p_brand, metric, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM u GROUP BY p_brand, metric
        |ORDER BY p_brand, metric""".stripMargin,
    // the script's loop unrolled: four threshold counts summed + the
    // half-max count, same arithmetic shapes (hi * i / 5.0)
    "q161_sql_scripting" ->
      """WITH hi AS (SELECT max(o_totalprice) AS h FROM orders)
        |SELECT CAST(
        |    (SELECT count(*) FROM orders, hi WHERE o_totalprice > h * 1 / 5.0)
        |  + (SELECT count(*) FROM orders, hi WHERE o_totalprice > h * 2 / 5.0)
        |  + (SELECT count(*) FROM orders, hi WHERE o_totalprice > h * 3 / 5.0)
        |  + (SELECT count(*) FROM orders, hi WHERE o_totalprice > h * 4 / 5.0)
        |  AS BIGINT) AS n_cumulative,
        |  CAST((SELECT count(*) FROM orders, hi WHERE o_totalprice > h / 2.0)
        |  AS BIGINT) AS n_above_half""".stripMargin,
    // the variable's defining subquery, inlined
    "q121_sql_session_vars" ->
      """SELECT o_orderstatus, count(*) AS n_above
        |FROM orders
        |WHERE o_totalprice > (SELECT quantile_cont(o_totalprice, 0.9)
        |                      FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // the bound parameters, restated as literals
    "q120_sql_parameterized" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue
        |FROM orders
        |WHERE year(o_orderdate) = 1997 AND o_totalprice < 200000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // DuckDB supports GROUP BY ALL / ORDER BY ALL natively — verbatim
    "q153_sql_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin,
    // the identifier, resolved
    "q154_sql_identifier" ->
      """SELECT o_orderstatus, count(*) AS n FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // the scalar UDF body inlines to q06's plan → q06's oracle
    "q148_sql_scalar_udf" ->
      RefQueries.oracles("q06_order_value_segments"),
    // the table-function call, inlined with its argument
    "q149_sql_table_udf" ->
      """SELECT o_custkey, count(*) AS n_big,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS big_revenue
        |FROM orders WHERE o_totalprice > 400000
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    // the dynamic statement, restated with the literal bound
    "q150_sql_exec_immediate" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE o_totalprice > 300000 GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // DuckDB runs the identical LATERAL statement
    "q145_sql_lateral_topcust" ->
      """SELECT n.n_name, t.c_custkey, t.bal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal
        |         FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 1) t
        |ORDER BY n.n_name""".stripMargin,
    // the pipe form parses to q06's plan → q06's oracle verbatim
    "q146_sql_pipe_segments"  -> RefQueries.oracles("q06_order_value_segments"),
    "q99_sql_order_segments"  -> RefQueries.oracles("q06_order_value_segments"),
    "q100_sql_rfm_view_chain" -> RefQueries.oracles("q08_rfm_summary"),
    "q101_sql_revenue_rollup" -> ExtAggQueries.oracles("q45_revenue_rollup"),
    "q102_sql_nation_rank"    -> WindowQueries.oracles("q33_nation_revenue_rank"),
    "q105_sql_bloom_probe" ->
      """SELECT CAST(100 AS BIGINT) AS n_probes,
        |       true AS all_present, true AS fp_ok""".stripMargin,
    "q106_sql_cms_probe" ->
      """SELECT o_custkey, count(*) AS exact_n,
        |       true AS no_underest, true AS within_slack
        |FROM orders GROUP BY o_custkey
        |ORDER BY exact_n DESC, o_custkey LIMIT 10""".stripMargin
  )
}
