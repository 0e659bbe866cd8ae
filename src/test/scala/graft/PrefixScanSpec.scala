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
