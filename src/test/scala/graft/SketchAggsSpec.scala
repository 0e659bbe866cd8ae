package graft

import java.io.ByteArrayInputStream

import graft.functions.{GraftFunctions, SketchAggs}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Per-group sketch aggregates: determinism across partitionings (merge
  * is commutative bit-OR / counter addition), the sketches' exact
  * guarantees (no Bloom false negatives, no CMS undercount), and SQL
  * parity through the registered functions. */
class SketchAggsSpec extends SparkSpec {
  import spark.implicits._

  private def bloomOf(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  private def cmsOf(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  private lazy val rows: Seq[(Long, Long)] =
    (0L until 2000L).map(i => (i % 4, i * 37 + i % 4))

  test("bloom_agg: per-group build has no false negatives") {
    val df = rows.toDF("g", "k")
    val built = df.groupBy($"g")
      .agg(SketchAggs.bloomAgg($"k", 1000L, 0.01).as("bf"))
      .collect().map(r => r.getLong(0) -> bloomOf(r.getAs[Array[Byte]](1)))
      .toMap
    assert(built.size == 4)
    rows.foreach { case (g, k) => assert(built(g).mightContainLong(k)) }
    // disjoint key spaces per group: cross-group hits are rare FPs
    val fp = rows.count { case (g, k) => built((g + 1) % 4).mightContainLong(k) }
    assert(fp <= rows.size / 20, s"fp=$fp")
  }

  test("bloom_agg: result bytes independent of partitioning") {
    val a = rows.toDF("g", "k").repartition(1).groupBy($"g")
      .agg(SketchAggs.bloomAgg($"k", 1000L, 0.01).as("bf"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val b = rows.toDF("g", "k").repartition(7, $"k").groupBy($"g")
      .agg(SketchAggs.bloomAgg($"k", 1000L, 0.01).as("bf"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (g, bytes) =>
      assert(java.util.Arrays.equals(bytes, b(g)), s"group $g bytes differ")
    }
  }

  test("cms_agg: never undercounts, totalCount exact, partition-invariant") {
    val skewed = (0L until 3000L).map(i => (i % 2, if (i % 3 == 0) 7L else i))
    val build = (n: Int) => {
      val df = skewed.toDF("g", "k")
      (if (n == 1) df.repartition(1) else df.repartition(n, $"k"))
        .groupBy($"g")
        .agg(SketchAggs.cmsAgg($"k", 5, 2048, 42).as("sk"))
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    }
    val a = build(1); val b = build(6)
    a.foreach { case (g, bytes) =>
      assert(java.util.Arrays.equals(bytes, b(g)), s"group $g bytes differ")
      val sk = cmsOf(bytes)
      val mine = skewed.filter(_._1 == g)
      assert(sk.totalCount() == mine.size)
      val exact7 = mine.count(_._2 == 7L)
      assert(sk.estimateCount(java.lang.Long.valueOf(7L)) >= exact7)
    }
  }

  test("probe scalars: bloom_might_contain / cms_estimate over a join") {
    val df = rows.toDF("g", "k")
    val sketches = df.groupBy($"g").agg(
      SketchAggs.bloomAgg($"k", 1000L, 0.01).as("bf"),
      SketchAggs.cmsAgg($"k", 5, 2048, 42).as("sk"))
    val probed = df.limit(50).join(broadcast(sketches), Seq("g"))
      .select(
        SketchAggs.bloomMightContain($"bf", $"k").as("hit"),
        SketchAggs.cmsEstimate($"sk", $"k").as("est"))
      .collect()
    assert(probed.length == 50)
    probed.foreach { r =>
      assert(r.getBoolean(0))
      assert(r.getLong(1) >= 1L)
    }
  }

  test("string keys round-trip through both sketches") {
    val docs = Seq((0L, "alpha"), (0L, "beta"), (1L, "gamma"), (1L, "alpha"))
      .toDF("g", "w")
    val out = docs.groupBy($"g").agg(
      SketchAggs.bloomAgg($"w", 100L, 0.01).as("bf"),
      SketchAggs.cmsAgg($"w", 5, 512, 7).as("sk"))
      .collect().map(r => r.getLong(0) ->
        (bloomOf(r.getAs[Array[Byte]](1)), cmsOf(r.getAs[Array[Byte]](2)))).toMap
    assert(out(0L)._1.mightContainString("alpha"))
    assert(out(0L)._1.mightContainString("beta"))
    assert(out(1L)._1.mightContainString("gamma"))
    assert(out(0L)._2.estimateCount("alpha") >= 1L)
    assert(out(1L)._2.estimateCount("alpha") >= 1L)
  }

  test("SQL sizing literals must be integral and in range") {
    GraftFunctions.register(spark)
    rows.toDF("g", "k").createOrReplaceTempView("sketch_sizing")
    // fractional depth would silently truncate; oversize width would
    // attempt a multi-GB counter allocation — both must fail analysis
    intercept[Exception] {
      spark.sql("SELECT cms_agg(k, 5.9, 8192, 42) FROM sketch_sizing")
        .collect()
    }
    intercept[Exception] {
      spark.sql("SELECT cms_agg(k, 5, 3000000000, 42) FROM sketch_sizing")
        .collect()
    }
    intercept[Exception] {
      spark.sql("SELECT bloom_agg(k, 0, 0.01) FROM sketch_sizing").collect()
    }
  }

  test("SQL parity: registered bloom_agg/cms_agg match the Column API") {
    GraftFunctions.register(spark)
    rows.toDF("g", "k").createOrReplaceTempView("sketch_in")
    val sql = spark.sql(
      """SELECT g, bloom_agg(k, 1000, 0.01) AS bf, cms_agg(k, 5, 2048, 42) AS sk
        |FROM sketch_in GROUP BY g""".stripMargin)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2))).toMap
    val api = rows.toDF("g", "k").groupBy($"g").agg(
      SketchAggs.bloomAgg($"k", 1000L, 0.01).as("bf"),
      SketchAggs.cmsAgg($"k", 5, 2048, 42).as("sk"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2))).toMap
    assert(sql.keySet == api.keySet)
    sql.foreach { case (g, (bf, sk)) =>
      assert(java.util.Arrays.equals(bf, api(g)._1), s"bloom bytes differ g=$g")
      assert(java.util.Arrays.equals(sk, api(g)._2), s"cms bytes differ g=$g")
    }
    val probe = spark.sql(
      """SELECT every(bloom_might_contain(bf, k)) AS ok,
        |       min(cms_estimate(sk, k)) AS mn
        |FROM (SELECT g, bloom_agg(k, 1000, 0.01) AS bf,
        |             cms_agg(k, 5, 2048, 42) AS sk
        |      FROM sketch_in GROUP BY g) s
        |JOIN (SELECT * FROM sketch_in LIMIT 40) p USING (g)""".stripMargin)
      .collect().head
    assert(probe.getBoolean(0))
    assert(probe.getLong(1) >= 1L)
  }
}
