package graft

import graft.operators.IncrementalView
import graft.sources.LakeTable
import org.apache.spark.sql.functions._

/** The invariant that makes incremental maintenance trustworthy: after
  * every CDC fold, the maintained view equals a from-scratch aggregate
  * of the corresponding snapshot — bit-identical, thanks to exact
  * decimal sums. */
class IncrementalViewSpec extends SparkSpec {

  private val groupCols = Seq("o_orderstatus")
  private val sums = Seq("revenue" -> "o_totalprice")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("o_orderstatus"), col("n"),
        col("revenue").cast("double"))
      .orderBy(col("o_orderstatus")).collect().toSeq

  test("view maintained from CDC deltas equals recompute at every version") {
    val dir = java.nio.file.Files.createTempDirectory("graft_iv").toString
    try {
      val orders = Tables.load(spark, sf, "orders")
      LakeTable.create(spark, dir, orders.filter(col("o_custkey") % 10 < 5))
      LakeTable.append(spark, dir, orders.filter(col("o_custkey") % 10 >= 5))
      LakeTable.deleteWhere(spark, dir, col("o_orderstatus") === "F")
      LakeTable.merge(spark, dir,
        orders.filter(col("o_custkey") % 97 === 0 &&
            col("o_orderstatus") =!= "F")
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        "o_orderkey")
      val vs = LakeTable.versions(spark, dir).sorted
      var view = IncrementalView.initial(
        LakeTable.read(spark, dir, Some(vs.head)), groupCols, sums)
      for ((from, to) <- vs.init.zip(vs.tail)) {
        view = IncrementalView.applyChanges(view,
          LakeTable.changes(spark, dir, from, to, "o_orderkey"),
          groupCols, sums)
        val recomputed = IncrementalView.initial(
          LakeTable.read(spark, dir, Some(to)), groupCols, sums)
        assert(canon(view) == canon(recomputed),
          s"divergence after folding $from -> $to")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(q => java.nio.file.Files.deleteIfExists(q))
    }
  }

  test("a group deleted to zero count drops out of the view") {
    import spark.implicits._
    val base = Seq(("A", 10.0), ("A", 5.0), ("B", 1.0)).toDF("k", "v")
    val view = IncrementalView.initial(base, Seq("k"), Seq("sv" -> "v"))
    val changes = Seq(("B", 1.0, "delete"), ("A", 2.0, "insert"))
      .toDF("k", "v", "_change_type")
    val next = IncrementalView.applyChanges(view, changes,
      Seq("k"), Seq("sv" -> "v"))
    val rows = next.orderBy(col("k")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue())).toSeq
    assert(rows == Seq(("A", 3L, 17.0)))
  }
}
