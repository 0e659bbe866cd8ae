package graft

import java.sql.Timestamp

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Boundary and multi-bin semantics of the bin-bucketed range join. */
class RangeJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("containment is [start, end): start inclusive, end exclusive") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00")),  // == start → in
      (2L, ts("2024-01-01 03:59:59")),  // just inside
      (3L, ts("2024-01-01 04:00:00")),  // == end → out
      (4L, ts("2023-12-31 23:59:59"))   // before → out
    ).toDF("id", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 04:00:00"))
    ).toDF("win", "s", "e")
    val out = RangeJoin.binnedContainment(left, "t", right, "s", "e", 3600)
      .select("id", "win").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 10L)))
  }

  test("intervals spanning many bins match rows in every covered bin") {
    import spark.implicits._
    // 10-second bins; interval covers 35 s → bins 0..3 (+boundary bin 4)
    val left = (0L until 40L by 5).map(sec =>
      (sec, new Timestamp(sec * 1000))).toDF("id", "t")
    val right = Seq((1L, new Timestamp(0L), new Timestamp(35 * 1000L)))
      .toDF("win", "s", "e")
    val out = RangeJoin.binnedContainment(left, "t", right, "s", "e", 10)
      .select("id").as[Long].collect().toSet
    assert(out == Set(0L, 5L, 10L, 15L, 20L, 25L, 30L)) // 35 excluded
  }

  test("a row matching two overlapping intervals appears twice") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 01:30:00"))).toDF("id", "t")
    val right = Seq(
      (10L, ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00")),
      (20L, ts("2024-01-01 01:15:00"), ts("2024-01-01 01:45:00"))
    ).toDF("win", "s", "e")
    val out = RangeJoin.binnedContainment(left, "t", right, "s", "e", 3600)
      .select("win").as[Long].collect().sorted
    assert(out.toSeq == Seq(10L, 20L))
  }

  test("matches the naive theta-join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1L to 200L).map(i =>
      (i, new Timestamp(rnd.nextInt(100000) * 1000L))).toDF("id", "t")
    val right = (1L to 30L).map { w =>
      val s = rnd.nextInt(90000)
      (w, new Timestamp(s * 1000L),
        new Timestamp((s + 1 + rnd.nextInt(20000)) * 1000L))
    }.toDF("win", "s", "e")
    val binned = RangeJoin.binnedContainment(left, "t", right, "s", "e", 7200)
      .select("id", "win").as[(Long, Long)].collect().toSet
    val naive = left.join(right, col("t") >= col("s") && col("t") < col("e"))
      .select("id", "win").as[(Long, Long)].collect().toSet
    assert(binned == naive && naive.nonEmpty)
  }
}
