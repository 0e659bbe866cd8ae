package graft

import graft.queries.RefQueries
import org.apache.spark.sql.functions._

class RefQueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and is non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query with an oracle exists in queries; names align") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q06 segments partition all orders (CASE totality)") {
    val orders = Tables.load(spark, sf, "orders").count()
    val segs = RefQueries.orderValueSegments(spark, sf)
      .agg(sum("n")).head().getLong(0)
    assert(segs == orders)
  }

  test("q08 RFM invariants: recency <= T, frequency >= 0, monetary > 0") {
    val bad = RefQueries.rfmSummary(spark, sf)
      .filter(col("recency") > col("t_weeks") ||
        col("frequency") < 0 || col("avg_monetary") <= 0)
      .count()
    assert(bad == 0)
  }

  test("q16 intersect is a subset of q15 union") {
    val u = RefQueries.unionNationKeys(spark, sf)
    val i = RefQueries.intersectNationKeys(spark, sf)
    assert(i.except(u).count() == 0)
  }

  test("q10 top customers is sorted descending by spend") {
    val spends = RefQueries.topCustomers(spark, sf)
      .select("spend").collect().map(_.getDouble(0))
    assert(spends.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("q25 surrogate ids: unique per row, min is 1") {
    val r = RefQueries.surrogateIds(spark, sf).head()
    assert(r.getAs[Long]("n_rows") == r.getAs[Long]("n_distinct_sk"))
    assert(r.getAs[Long]("min_sk") == 1L)
  }

  test("S13 cached scan reports an active storage level") {
    val df = Tables.loadCached(spark, sf, "nation")
    try {
      df.count()
      assert(df.storageLevel.useMemory || df.storageLevel.useDisk)
    } finally df.unpersist()
  }

  test("q02 monthly active: yr/mo pairs are unique and ordered") {
    val rows = RefQueries.monthlyActiveCustomers(spark, sf)
      .select("yr", "mo").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.distinct.length == rows.length)
    assert(rows.sameElements(rows.sorted))
  }
}
