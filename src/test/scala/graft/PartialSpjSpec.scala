package graft

import graft.sources.LakeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Partially-clustered storage-partitioned joins (Spark's
  * `v2.bucketing.partiallyClusteredDistribution`, the SPJ skew path):
  * the scan emits one keyed InputPartition per file SPLIT and leaves
  * grouping to `BatchScanExec.groupPartitions`, so under the flag a
  * hot partition value's many files stay many tasks (the other side's
  * matching partition replicates) while the join still plans ZERO
  * exchanges. With the flag off the same join merges splits back to
  * one task per value — also exchange-free — and the flag never
  * changes results. This is the one SPJ variant q326/q331/q339 left
  * out: the skewed fact-to-dim join at 100 TB, where pre-merging
  * would cap the hot key at one task. */
class PartialSpjSpec extends SparkSpec {

  private def shuffles(df: DataFrame): Int = {
    df.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
    df.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeLike => s }.size
  }

  private def withFlags[A](partial: Boolean)(body: => A): A = {
    val cs = List(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      ("spark.sql.sources.v2.bucketing." +
        "partiallyClusteredDistribution.enabled") -> partial.toString,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    def nest(rest: List[(String, String)]): A = rest match {
      case Nil => body
      case (k, v) :: t => graft.util.LocalFrame.withConf(spark, k, v)(nest(t))
    }
    nest(cs)
  }

  test("skewed SPJ under partiallyClusteredDistribution: the hot " +
    "value's splits stay separate tasks, zero exchanges, same results") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pcspj").toString
    try {
      import spark.implicits._
      // skewed fact: key 0 is hot and lands in TWO appends (= two file
      // groups = two splits); keys 1..4 are small, one append each
      val hot1 = (1L to 5000L).map(i => (0L, i)).toDF("r", "v")
      val hot2 = (5001L to 10000L).map(i => (0L, i)).toDF("r", "v")
      val tail = (1L to 10L).flatMap(i => (1L to 4L).map(k => (k, i)))
        .toDF("r", "v")
      val dim = (0L to 4L).map(k => (k, s"name$k")).toDF("r", "name")
      LakeTable.createEmpty(spark, s"$dir/f", hot1.schema, Seq("r"))
      LakeTable.append(spark, s"$dir/f", hot1.unionByName(tail))
      LakeTable.append(spark, s"$dir/f", hot2)
      LakeTable.createEmpty(spark, s"$dir/d", dim.schema, Seq("r"))
      LakeTable.append(spark, s"$dir/d", dim)
      val t1 = spark.read.format("graft-lake").load(s"$dir/f")
      val t2 = spark.read.format("graft-lake").load(s"$dir/d")
      def joined = t1.join(t2, "r")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          countDistinct(col("name")).as("d"))
      val expected = (10040L, (1L to 10000L).sum + 4 * (1L to 10L).sum, 5L)
      val (exPartial, nPartsPartial, rPartial) = withFlags(partial = true) {
        val j = t1.join(t2, "r")
        val ex = shuffles(j)
        (ex, j.rdd.getNumPartitions, joined.head())
      }
      // the hot value keeps BOTH its splits as separate tasks: more
      // join partitions than distinct values
      assert(exPartial == 0, "partially-clustered SPJ must be exchange-free")
      assert(nPartsPartial == 6,
        s"expected 6 join partitions (hot value unmerged), got $nPartsPartial")
      assert((rPartial.getLong(0), rPartial.getLong(1), rPartial.getLong(2))
        == expected)
      val (exPlain, nPartsPlain, rPlain) = withFlags(partial = false) {
        val j = t1.join(t2, "r")
        val ex = shuffles(j)
        (ex, j.rdd.getNumPartitions, joined.head())
      }
      assert(exPlain == 0, "plain SPJ must stay exchange-free")
      assert(nPartsPlain == 5,
        s"expected 5 join partitions (one per value), got $nPartsPlain")
      assert((rPlain.getLong(0), rPlain.getLong(1), rPlain.getLong(2))
        == expected)
    } finally graft.util.Tmp.deleteRecursively(
      java.nio.file.Paths.get(dir))
  }
}
