package graft

import graft.functions.ZOrderInterleave
import graft.sources.LakeTable
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("interleave puts a on even bits, b on odd bits") {
    assert(ZOrderInterleave.interleave(0L, 0L) == 0L)
    assert(ZOrderInterleave.interleave(1L, 0L) == 1L) // a0 → bit 0
    assert(ZOrderInterleave.interleave(0L, 1L) == 2L) // b0 → bit 1
    assert(ZOrderInterleave.interleave(3L, 0L) == 5L) // a0,a1 → bits 0,2
    assert(ZOrderInterleave.interleave(0L, 3L) == 10L) // b0,b1 → bits 1,3
    assert(ZOrderInterleave.interleave(0xffffffffL, 0xffffffffL) == -1L)
    // high input bits beyond 32 are masked, not smeared
    assert(ZOrderInterleave.interleave(1L << 40, 0L) == 0L)
  }

  test("quadrant ordering: top-right quadrant has the largest z values") {
    // for 2-bit coords, all points in quadrant (a>=2, b>=2) sort after
    // all points in quadrant (a<2, b<2)
    val low = for (a <- 0 to 1; b <- 0 to 1)
      yield ZOrderInterleave.interleave(a, b)
    val high = for (a <- 2 to 3; b <- 2 to 3)
      yield ZOrderInterleave.interleave(a, b)
    assert(low.max < high.min)
  }

  test("expression evaluates in codegen identically to the JVM helper") {
    import spark.implicits._
    val df = Seq((5L, 9L), (0L, 0L), (65535L, 1L))
      .toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrderInterleave(col("a"), col("b")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) ==
        ZOrderInterleave.interleave(r.getLong(0), r.getLong(1)))
    }
  }

  test("createClustered: groups carry stats; corner reads prune and agree") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    try {
      val orders = Tables.load(spark, sf, "orders")
        .withColumn("o_days",
          datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"))
      val b = orders.agg(
        max(col("o_custkey")).cast("double"),
        max(col("o_days")).cast("double")).head()
      val (ckHi, dHi) = (b.getDouble(0), b.getDouble(1))
      val keyed = orders.withColumn("zkey", ZOrderInterleave(
        (col("o_custkey").cast("double") / ckHi * 65535.0).cast("long"),
        (col("o_days").cast("double") / dHi * 65535.0).cast("long")))
      LakeTable.createClustered(spark, dir, keyed, "zkey", 8,
        Seq("o_custkey", "o_days"))
      val total = LakeTable.dataDirPaths(spark, dir).size
      assert(total > 1, "range partitioner must produce multiple groups")
      // both dimensions prune on a top-decile corner
      for ((c, hi) <- Seq(("o_custkey", ckHi), ("o_days", dHi))) {
        val kept = LakeTable.selectGroups(spark, dir, c, 0.9 * hi, hi)
        assert(kept.size < total, s"no pruning on $c")
        val expected = orders
          .filter(col(c).cast("double").between(0.9 * hi, hi)).count()
        assert(LakeTable.readWhere(spark, dir, c, 0.9 * hi, hi).count()
          == expected)
      }
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(q => java.nio.file.Files.deleteIfExists(q))
    }
  }
}
