package graft

import graft.functions.BandedCollectAgg
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._

/** [[graft.functions.BandedCollectAgg]] — the bounded bucket-collect
  * behind q231's seed join: equivalent to collect_list + distinct-key
  * band filter, but a group past the ceiling frees its state instead
  * of materializing the hot key's fanout first. */
class BandedCollectSpec extends SparkSpec {

  private def banded(maxKeys: Int) = ColumnBridge.column(
    BandedCollectAgg(ColumnBridge.expression(col("doc_id")),
      ColumnBridge.expression(col("i")), maxKeys).toAggregateExpression())

  test("groups over the distinct-key ceiling evaluate to NULL; " +
    "groups under it collect every pair") {
    import spark.implicits._
    // group "hot": 60 distinct docs (2 pairs each); "cool": 3 docs
    val rows =
      (1L to 60L).flatMap(d => Seq(("hot", d, d.toInt), ("hot", d, d.toInt + 1))) ++
      (1L to 3L).map(d => ("cool", d, d.toInt))
    val out = rows.toDF("h", "doc_id", "i")
      .groupBy(col("h")).agg(banded(50).as("xs"))
      .select(col("h"), col("xs"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("hot").isEmpty, "hot group must be NULL (ceiling breached)")
    assert(out("cool").nonEmpty)
    val cool = rows.toDF("h", "doc_id", "i")
      .groupBy(col("h")).agg(banded(50).as("xs"))
      .filter(col("h") === "cool")
      .select(explode(col("xs")).as("x"))
      .select(col("x.doc_id"), col("x.i"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(cool == Seq((1L, 1), (2L, 2), (3L, 3)))
  }

  test("equivalent to collect_list + band filter, under any partitioning") {
    import spark.implicits._
    // deterministic pseudo-random spread: 40 groups, variable fanout
    val rows = (1 to 4000).map { n =>
      (s"g${n % 40}", (n * 2654435761L) % (1 + n % 97), n)
    }
    def normalize(df: org.apache.spark.sql.DataFrame): Seq[(String, Seq[(Long, Int)])] =
      df.select(col("h"), col("xs"))
        .collect()
        .filter(_.get(1) != null)
        .map { r =>
          val xs = r.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getLong(0), x.getInt(1))).sorted
          (r.getString(0), xs)
        }.sortBy(_._1).toSeq
    val plain = rows.toDF("h", "doc_id", "i")
      .groupBy(col("h"))
      .agg(collect_list(struct(col("doc_id"), col("i"))).as("xs"))
      .filter(expr("size(array_distinct(transform(xs, x -> x.doc_id)))") <= 20)
    for (parts <- Seq(1, 3, 7)) {
      val got = rows.toDF("h", "doc_id", "i").repartition(parts)
        .groupBy(col("h")).agg(banded(20).as("xs"))
        .filter(col("xs").isNotNull)
      assert(normalize(got) == normalize(plain),
        s"banded_collect diverged from collect_list+filter at $parts partitions")
    }
  }

  test("nulls are skipped (collect_list's rule) and type checks fire") {
    import spark.implicits._
    val withNulls = Seq((Some(1L), Some(1)), (None, Some(2)), (Some(2L), None),
        (Some(3L), Some(3)))
      .toDF("doc_id", "i").withColumn("h", lit("g"))
    val xs = withNulls.groupBy(col("h")).agg(banded(10).as("xs"))
      .select(explode(col("xs")).as("x"))
      .select(col("x.doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(xs == Seq(1L, 3L))
    intercept[Exception] {
      Seq(("g", "notlong", 1)).toDF("h", "doc_id", "i")
        .groupBy(col("h")).agg(banded(10)).collect()
    }
  }
}
