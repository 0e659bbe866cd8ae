package graft

import graft.functions.MisraGriesAgg
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._

/** Misra–Gries guarantees (q259 surface) on skewed synthetic streams
  * under adversarial partitionings: the theorems must hold for EVERY
  * merge tree, which is what Spark's map-side-combined aggregation
  * subjects the sketch to. */
class MisraGriesSpec extends SparkSpec {

  // Zipf-ish stream: term i (of 200) appears ~ 12000/i times; n ≈ 70k,
  // so with k = 20 the heavy set {true > n/k} is small and non-empty
  private def stream = {
    import spark.implicits._
    (1 to 200).flatMap(i => Seq.fill(12000 / i)(s"t$i")).toDF("w")
  }

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val mg = MisraGriesAgg(ColumnBridge.expression(col("w")), k)
    df.agg(ColumnBridge.column(mg.toAggregateExpression()).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("every term above n/k survives; estimates within [true - n/k, true]") {
    val df = stream
    val truth = df.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val k = 20
    for (parts <- Seq(1, 4, 13)) {
      val sk = sketchOf(df.repartition(parts), k)
      assert(sk.size <= k - 1, s"cap broken at $parts partitions")
      truth.foreach { case (t, c) =>
        if (c > n / k)
          assert(sk.contains(t), s"heavy term $t (true $c) lost at $parts parts")
      }
      sk.foreach { case (t, est) =>
        val c = truth(t)
        assert(est <= c, s"$t overestimated: $est > $c ($parts parts)")
        assert(c - est <= n / k, s"$t undercount beyond n/k ($parts parts)")
      }
    }
  }

  test("degenerate streams: single term, all-distinct, nulls ignored") {
    import spark.implicits._
    val single = Seq.fill(100)("x").toDF("w")
    assert(sketchOf(single, 4) == Map("x" -> 100L))
    // all-distinct with k=4: no term exceeds n/k, bounds still hold
    val distinctS = (1 to 40).map(i => s"d$i").toDF("w")
    val sk = sketchOf(distinctS, 4)
    assert(sk.size <= 3 && sk.values.forall(v => v >= 0 && v <= 1))
    val withNulls = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("w")
    val sk2 = sketchOf(withNulls, 8)
    assert(sk2 == Map("a" -> 2L, "b" -> 1L))
  }
}
