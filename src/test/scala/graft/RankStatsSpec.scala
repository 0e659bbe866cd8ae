package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver-side BigInt replay of the q320/q321 rank statistics.
  *
  * The queries compute doubled midranks with [[graft.operators.PrefixScan]]
  * over the distinct-value frame and stage every division as integer
  * `div`; the DuckDB oracle replays the same staging in SQL. This spec is
  * the THIRD, fully independent path: collect the tiny sf0.001 base rows,
  * sort and rank them in plain Scala, and fold the exact BigInt formulas
  * by hand. Any disagreement in rank handling (ties, midranks), overflow
  * promotion, or division staging between the distributed plan and the
  * written-down math fails here with exact integers on both sides.
  */
class RankStatsSpec extends SparkSpec {

  /** value -> doubled midrank (2r = 2·countBelow + tieCount + 1). */
  private def doubledRanks(vs: Seq[Long]): Map[Long, BigInt] = {
    val ct = vs.groupBy(identity).map { case (v, g) => (v, g.size.toLong) }
    val sorted = ct.keys.toSeq.sorted
    var below = 0L
    sorted.map { v =>
      val r2 = BigInt(2) * below + ct(v) + 1
      below += ct(v)
      v -> r2
    }.toMap
  }

  test("q320 Spearman: distributed result equals the BigInt hand fold") {
    val per = Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("x"),
        (sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
          .cast("long").as("y"))
      .select("x", "y")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    val n = BigInt(per.size)
    val rx = doubledRanks(per.map(_._1))
    val ry = doubledRanks(per.map(_._2))
    var num, denx, deny = BigInt(0)
    per.foreach { case (x, y) =>
      val dx = rx(x) - n - 1
      val dy = ry(y) - n - 1
      num += dx * dy; denx += dx * dx; deny += dy * dy
    }
    val rho2 = {
      val mag = (num * num * 1000000) / (denx * deny)
      if (num >= 0) mag else -mag
    }

    val row = graft.queries.ExtAggQueries.spearmanRho(spark, sf).head()
    assert(row.getLong(row.fieldIndex("n")) == n.toLong)
    assert(row.getLong(row.fieldIndex("spearman_num")) == num.toLong)
    assert(row.getLong(row.fieldIndex("den_x")) == denx.toLong)
    assert(row.getLong(row.fieldIndex("den_y")) == deny.toLong)
    assert(row.getLong(row.fieldIndex("rho2_ppm")) == rho2.toLong)
    // frequent buyers spend more: the monotone link must be strongly
    // positive on TPC-H-ish data (spend ≈ sum of per-order totals)
    assert(rho2 > 100000L, s"rho²=$rho2 ppm unexpectedly weak")
  }

  test("q321 Kruskal–Wallis: distributed result equals the BigInt fold") {
    val base = Tables.load(spark, sf, "orders")
      .select(
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"),
        col("o_orderpriority").as("pri"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
    val r2 = doubledRanks(base.map(_._1))
    val n = BigInt(base.size)
    val groups = base.groupBy(_._2).map { case (pri, rows) =>
      val ni = BigInt(rows.size)
      val r2i = rows.map(r => r2(r._1)).sum
      (pri, ni, r2i)
    }.toSeq
    val terms = groups.map { case (_, ni, r2i) => (r2i * r2i) / ni }.sum
    val h = (terms * 3000000) / (n * (n + 1)) - 3 * (n + 1) * 1000000
    val tieCubes = base.map(_._1).groupBy(identity).values
      .map(g => BigInt(g.size).pow(3) - g.size).sum
    val n3n = n.pow(3) - n
    val hCorr = (h * n3n) / (n3n - tieCubes)

    val row = graft.queries.ExtAggQueries.kruskalWallis(spark, sf).head()
    assert(row.getLong(row.fieldIndex("n")) == n.toLong)
    assert(row.getLong(row.fieldIndex("n_groups")) == groups.size.toLong)
    assert(row.getLong(row.fieldIndex("h_ppm")) == h.toLong)
    assert(row.getLong(row.fieldIndex("tie_cubes")) == tieCubes.toLong)
    assert(row.getLong(row.fieldIndex("h_corr_ppm")) == hCorr.toLong)
    // priorities are assigned independently of totals in the generator,
    // so H should sit near its k−1 = 4 expectation, far from the
    // ~n-scale values a real effect would produce — but never negative
    // beyond the documented < k·3·10⁶/(n(n+1)) truncation slack.
    assert(h >= -10L && h < 50L * 1000000L, s"H=$h ppm implausible")
  }
}
