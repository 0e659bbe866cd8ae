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

  test("keyedBand: inclusive boundary, key isolation, and theta-join " +
    "equivalence on random data") {
    import spark.implicits._
    // hand-picked edges: exactly tol apart (match), one second over
    // (no match), same times different key (no match)
    val l = Seq(
      (1L, 100L, new Timestamp(10000 * 1000L)),
      (2L, 100L, new Timestamp(20000 * 1000L)),
      (3L, 200L, new Timestamp(10000 * 1000L))
    ).toDF("lid", "k", "lt")
    val r = Seq(
      (10L, 100L, new Timestamp((10000 + 3600) * 1000L)), // == tol from lid 1
      (11L, 100L, new Timestamp((20000 + 3601) * 1000L)), // just over from lid 2
      (12L, 300L, new Timestamp(10000 * 1000L))           // wrong key for lid 3
    ).toDF("rid", "rk", "rt")
    val got = RangeJoin.keyedBand(l, "k", "lt", r, "rk", "rt", 3600)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
    // randomized equivalence against the naive theta join
    val rnd = new scala.util.Random(11)
    val bigL = (1L to 300L).map(i =>
      (i, rnd.nextInt(5).toLong, new Timestamp(rnd.nextInt(100000) * 1000L)))
      .toDF("lid", "k", "lt")
    val bigR = (1L to 300L).map(i =>
      (i, rnd.nextInt(5).toLong, new Timestamp(rnd.nextInt(100000) * 1000L)))
      .toDF("rid", "rk", "rt")
    val banded = RangeJoin.keyedBand(bigL, "k", "lt", bigR, "rk", "rt", 1800)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = bigL.join(bigR, col("k") === col("rk") &&
        abs(unix_timestamp(col("lt")) - unix_timestamp(col("rt"))) <= 1800)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(banded == naive && naive.nonEmpty)
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
