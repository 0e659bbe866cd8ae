package graft

import graft.operators.PrefixScan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PrefixScan (q256 surface): the range-exchange two-pass running sum
  * must equal the single-partition window form exactly, independent of
  * input partitioning. */
class PrefixScanSpec extends SparkSpec {

  private def orders = spark.read.parquet(s"$sf/orders.parquet")
    .select(col("o_orderkey").as("k"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("v"))

  test("running sum equals the window form on a total order") {
    val got = PrefixScan.withRunningSum(orders, Seq(col("k")), col("v"), "run")
      .select(col("k"), col("run"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = orders
      .withColumn("run", sum(col("v")).over(
        Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == want)
  }

  test("result is invariant to input partitioning") {
    val base = orders
    val a = PrefixScan.withRunningSum(base.repartition(1),
      Seq(col("k")), col("v"), "run")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val b = PrefixScan.withRunningSum(base.repartition(7, col("v")),
      Seq(col("k")), col("v"), "run")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
    // the last prefix is the grand total
    assert(a.map(_._2).max == base.agg(sum(col("v"))).head().getLong(0))
  }

  test("multi-column order with desc direction and tiebreak") {
    val df = orders.withColumn("g", col("k") % 3)
    val got = PrefixScan.withRunningSum(df,
      Seq(col("g").desc, col("k")), col("v"), "run")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val want = df.withColumn("run", sum(col("v")).over(
        Window.orderBy(col("g").desc, col("k"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got == want)
  }

  test("withRunningSumAndRank: contiguous 1-based ranks in key order") {
    val out = PrefixScan.withRunningSumAndRank(orders.repartition(5),
        Seq(col("k")), col("v"), "run", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.map(_._3).toSeq == (1L to out.length).toSeq,
      "ranks not contiguous in key order")
    // the rank+1 self-join (the distributed lead()) reconstructs the
    // sorted neighbor pairs exactly
    val byRank = out.map(t => t._3 -> t._1).toMap
    out.init.zip(out.tail).foreach { case (a, b) =>
      assert(byRank(a._3 + 1) == b._1)
    }
    assert(out.last._2 ==
      orders.agg(sum(col("v"))).head().getLong(0))
  }

  test("reuse contract: one range exchange, upstream evaluates once") {
    // plan half: the partitioned frame's executed plan carries exactly
    // one exchange — the range exchange both passes ride
    val withV = orders.withColumn("_pv", col("v"))
    val parted = withV.repartitionByRange(col("k"))
      .sortWithinPartitions(col("k"))
    // sparkPlan, not executedPlan: AQE wraps the executed plan in an
    // AdaptiveSparkPlanExec whose children only materialize on run
    val exchanges = parted.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size == 1,
      s"expected the single range exchange, got ${exchanges.size}")
    assert(exchanges.head.outputPartitioning.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.physical.RangePartitioning],
      s"exchange is not the range exchange: ${exchanges.head.outputPartitioning}")
    // recompute half: an accumulator on the UPSTREAM (map side of the
    // exchange) counts partition evaluations; after the two scan
    // passes it must equal the upstream partition count — the shuffle
    // map stage ran once and pass 2 read its files, never the lineage
    val acc = spark.sparkContext.longAccumulator("upstream_evals")
    import spark.implicits._
    val src = orders.as[(Long, Long)].repartition(6)
      .mapPartitions { it => acc.add(1); it }
      .toDF("k", "v")
    val out = PrefixScan.withRunningSum(src, Seq(col("k")), col("v"), "run")
    out.collect()
    // 12 = 6 (RangePartitioner boundary sampling) + 6 (the shuffle map
    // write) — both inside pass 1. If pass 2 recomputed the upstream
    // instead of reading pass 1's shuffle files this would be >= 18.
    assert(acc.value == 12,
      s"upstream evaluated ${acc.value} partition-passes, expected 12 " +
        "(sample + one shuffle write) — the range-exchange shuffle " +
        "output was not reused across passes")
  }

  test("withRunningSums: N measures equal N window sums from ONE exchange") {
    val df = orders.withColumn("w", col("k") % 7)
    val out = PrefixScan.withRunningSums(df.repartition(5),
      Seq(col("k")), Seq(col("v") -> "rv", col("w") -> "rw"))
    // both cumulatives exact vs the window form
    val got = out.collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getLong(4)))).toMap
    val want = df
      .withColumn("rv", sum(col("v")).over(
        Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("rw", sum(col("w")).over(
        Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(r => (r.getLong(0), (r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    // single-exchange + shuffle-reuse is asserted by the reuse-contract
    // test above — the multi-measure form runs through the same scan
    // (one range exchange regardless of measure count; pass-1 partials
    // just carry one extra long per measure)
  }

  test("reserved and colliding column names are rejected") {
    intercept[IllegalArgumentException] {
      PrefixScan.withRunningSum(orders.withColumn("_ps_v", lit(1L)),
        Seq(col("k")), col("v"), "run")
    }
    intercept[IllegalArgumentException] {
      PrefixScan.withRunningSum(orders, Seq(col("k")), col("v"), "v")
    }
  }
}
