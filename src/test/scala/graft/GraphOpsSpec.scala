package graft

import org.apache.spark.sql.functions._

/** q283 label propagation, q284 multi-source BFS, q285 exact central
  * moments — each checked against an independent driver-side replay on
  * the sf0.001 graph/table (small enough to brute-force), plus the
  * bit-identical-rerun determinism gate the integer discipline earns.
  */
class GraphOpsSpec extends SparkSpec {

  private def edges(): Seq[(Long, Long)] = {
    val items = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).values
    val pairCnt = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.foreach { basket =>
      val pks = basket.map(_._2).sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length)
        pairCnt((pks(i), pks(j))) = pairCnt.getOrElse((pks(i), pks(j)), 0) + 1
    }
    val und = pairCnt.filter(_._2 >= 2).keys.toSeq
    und ++ und.map { case (a, b) => (b, a) }
  }

  test("q283: Spark LPA matches a driver-side synchronous replay") {
    val e = edges()
    val adj = e.groupBy(_._1).map { case (u, es) => (u, es.map(_._2)) }
    var lbl: Map[Long, Long] = adj.keys.map(v => (v, v)).toMap
    for (_ <- 1 to 2) {
      lbl = adj.map { case (u, nbrs) =>
        val cnt = nbrs.groupBy(lbl).map { case (l, xs) => (l, xs.size) }
        val mc = cnt.values.max
        (u, cnt.filter(_._2 == mc).keys.min)
      }
    }
    val got = graft.queries.MiscQueries.labelPropagation(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == lbl)
    assert(got.nonEmpty)
    // every community label is a graph node (labels only ever propagate)
    assert(got.values.toSet.subsetOf(got.keySet))
  }

  test("q284: Spark BFS histogram matches a driver-side BFS replay") {
    val e = edges()
    val adj = e.groupBy(_._1).map { case (u, es) => (u, es.map(_._2).toSet) }
    val brand = Tables.load(spark, sf, "part")
      .filter(col("p_brand") === "Brand#4")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val nodes = adj.keySet
    var visited: Map[Long, Long] = (nodes & brand).map(v => (v, 0L)).toMap
    for (k <- 1 to 3) {
      val frontier = visited.filter(_._2 == k - 1).keySet
      val next = frontier.flatMap(adj(_)) -- visited.keySet
      visited = visited ++ next.map(v => (v, k.toLong))
    }
    val expect = (visited.values.groupBy(identity)
      .map { case (d, xs) => (d, xs.size.toLong) } ++
      (if (nodes.size > visited.size)
        Map(-1L -> (nodes.size - visited.size).toLong) else Map.empty))
    val got = graft.queries.MiscQueries.bfsHops(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expect)
    assert(got.getOrElse(0L, 0L) > 0, "no sources reached the graph")
    // the DISTRIBUTED visited-frame path (the 100 TB posture behind
    // the size guard) must agree bit-for-bit with the local path
    val gotDist = graft.queries.MiscQueries
      .bfsHopsPath(spark, sf, distributed = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotDist == expect, "distributed BFS diverged from local")
    // and the guard itself picks the local path at this edge count
    val nEdges = 2L * graft.queries.MiscQueries
      .coPurchasePairs(spark, sf).count()
    assert(nEdges < graft.queries.MiscQueries.BfsDistributedMinEdges,
      "sf0.001 unexpectedly crossed the distributed-BFS guard")
  }

  test("q290: Spark Bellman-Ford matches a driver-side min-plus replay") {
    val e = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sf, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey"), col("s_nationkey")).count()
      .collect()
      .map(r => ((r.getAs[Number](0).longValue, r.getAs[Number](1).longValue),
        1000000000L / r.getLong(2) + 1))
    var dist = Map(0L -> 0L)
    for (_ <- 1 to 3) {
      val relaxed = e.flatMap { case ((u, v), c) =>
        dist.get(u).map(du => (v, du + c)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (v, ds) => (v, ds.map(_._2).min) }
    }
    val names = Tables.load(spark, sf, "nation")
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1))).toMap
    val expect = dist.map { case (v, d) => (names(v), d) }
    val got = graft.queries.MiscQueries.shortestPaths(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expect)
    assert(got(names(0L)) == 0L, "source distance must be 0")
  }

  test("q285: exact-integer moments agree with a float replay; reruns bit-identical") {
    val rows = graft.queries.ExtAggQueries.centralMoments(spark, sf).collect()
    assert(rows.length == 5)
    val usd = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        ((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long") / 100).cast("long").as("usd"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2.toDouble)) }
    rows.foreach { r =>
      val xs = usd(r.getString(0))
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val m2 = xs.map(x => math.pow(x - mean, 2)).sum / n
      val m3 = xs.map(x => math.pow(x - mean, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mean, 4)).sum / n
      assert(r.getLong(1) == xs.length)
      assert(math.abs(r.getDouble(2) - mean) < 1e-3)
      assert(math.abs(r.getDouble(3) - m2) / m2 < 1e-6)
      assert(math.abs(r.getDouble(4) - m3 / (m2 * math.sqrt(m2))) < 1e-4)
      assert(math.abs(r.getDouble(5) - (m4 / (m2 * m2) - 3.0)) < 1e-4)
    }
    val again = graft.queries.ExtAggQueries.centralMoments(spark, sf)
      .collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
