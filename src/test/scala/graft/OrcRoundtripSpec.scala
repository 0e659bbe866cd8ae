package graft

import org.apache.spark.sql.functions._

/** q232's plan facts: the partitioned ORC layout must prune at the
  * directory level and push the price predicate into the ORC reader —
  * otherwise the "round trip" is just a full rewrite-and-rescan. */
class OrcRoundtripSpec extends SparkSpec {

  test("ORC read prunes partitions and pushes the price filter") {
    val o = Tables.load(spark, sf, "orders")
    graft.util.Tmp.withTempDir("graft_orcspec") { stage =>
      val path = new java.io.File(stage.toString, "orders_orc").toString
      o.write.partitionBy("o_orderstatus").orc(path)
      val back = spark.read.orc(path)
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 100000.0)
      val plan = back.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") &&
        plan.contains("o_orderstatus"),
        s"status filter not applied at partition level:\n$plan")
      assert(plan.contains("PushedFilters") &&
        plan.contains("GreaterThan(o_totalprice"),
        s"price predicate not pushed to the ORC reader:\n$plan")
      // and the pruned scan reads only the F directory's rows
      val expected = o.filter(col("o_orderstatus") === "F" &&
        col("o_totalprice") > 100000.0).count()
      assert(back.count() == expected)
    }
  }

  test("q232 values survive the ORC round trip") {
    val got = graft.queries.MiscQueries.orcRoundtrip(spark, sf)
      .collect().map(_.toSeq).toSeq
    val want = Tables.load(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 100000.0)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n_orders"),
        Tables.sumMoney(col("o_totalprice")).as("revenue"),
        countDistinct(col("o_custkey")).as("n_custs"))
      .orderBy(col("yr"))
      .collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }
}
