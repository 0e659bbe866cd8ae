package graft

import graft.plans.{TopKPerGroup, TopKPerGroupExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, sf, "orders")
    .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  test("custom top-k operator equals the window-function formulation") {
    val custom = TopKPerGroup.topK(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .drop("rn")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(custom.length == viaWindow.length)
    custom.zip(viaWindow).foreach { case (c, e) => assert(c == e) }
  }

  test("the physical plan contains the custom exec and no Window/Sort") {
    val df = TopKPerGroup.topK(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    df.count() // force planning through AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Window"), "window exec should not appear")
  }

  test("k larger than every group returns the whole table") {
    val n = orders.count()
    val all = TopKPerGroup.topK(orders, Seq("o_custkey"),
      Seq(("o_orderkey", true)), 1000000).count()
    assert(all == n)
  }

  test("k = 1 returns exactly one row per customer, the best one") {
    val best = TopKPerGroup.topK(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 1)
    val perKey = best.groupBy("o_custkey").count()
      .filter(col("count") =!= 1).count()
    assert(perKey == 0)
    val expect = orders.groupBy("o_custkey")
      .agg(max(col("o_totalprice")).as("mx")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    best.collect().foreach { r =>
      assert(r.getDouble(2) == expect(r.getLong(0)),
        s"customer ${r.getLong(0)}: not the max-price order")
    }
  }

  test("results are identical under different input partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      TopKPerGroup.topK(df, Seq("o_custkey"),
          Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
        .collect().toSeq
    assert(run(orders.repartition(1)) == run(orders.repartition(17)))
  }

  // physical nodeName prints without the "Exec" suffix
  private def execNodeName = "TopKPerGroup "

  test("WindowTopKRewrite: rank-discarding row_number idiom plans as TopKPerGroupExec") {
    import org.apache.spark.sql.expressions.Window
    graft.plans.WindowTopKRewrite.enable(spark)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaIdiom = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val plan = viaIdiom.queryExecution.executedPlan.toString
    assert(plan.contains(execNodeName), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"Window survived the rewrite:\n$plan")
    // answer identical to the explicit-operator form
    val direct = TopKPerGroup.topK(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().toSeq
    val got = viaIdiom
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().toSeq
    assert(got == direct)
  }

  test("WindowTopKRewrite leaves rank-keeping and multi-conjunct filters alone") {
    import org.apache.spark.sql.expressions.Window
    graft.plans.WindowTopKRewrite.enable(spark)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    // rank kept in the output → no rewrite possible
    val keepsRank = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    assert(!keepsRank.queryExecution.executedPlan.toString
      .contains(execNodeName))
    // extra conjunct → no rewrite (conservative match)
    val conjunct = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("o_totalprice") > 0)
      .select(col("o_custkey"), col("o_orderkey"))
    assert(!conjunct.queryExecution.executedPlan.toString
      .contains(execNodeName))
  }
}
