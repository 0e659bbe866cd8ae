package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("as-of join edges: no prior match → null; ties resolve to max tiebreak") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, t("2024-01-01 10:00:00")), // after both right rows
      (2L, 100L, t("2024-01-01 08:30:00")), // between right rows
      (3L, 100L, t("2024-01-01 07:00:00")), // before any right row
      (4L, 200L, t("2024-01-01 10:00:00"))  // key with no right rows at all
    ).toDF("lid", "k", "lt")
    val right = Seq(
      (10L, 100L, t("2024-01-01 08:00:00")),
      (11L, 100L, t("2024-01-01 09:00:00")),
      (12L, 100L, t("2024-01-01 09:00:00")) // tie on time → max rid wins
    ).toDF("rid", "k", "rt")

    val joined = AsOfJoin.joinAsOf(left, right, "k", "lt", "rt", "rid",
        Seq("rid"))
      .select(col("lid"), col("_asof.rid").as("matched"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any]("matched")))
      .toMap

    assert(joined(1L).contains(12L), "tie at 09:00 must pick max rid")
    assert(joined(2L).contains(10L), "between rows → earlier one")
    assert(joined(3L).isEmpty, "no prior right row → null")
    assert(joined(4L).isEmpty, "unmatched key → null")
  }

  test("forward as-of: earliest later row, ties to min tiebreak, " +
    "inclusive boundary") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, t("2024-01-01 07:00:00")), // before both → earliest
      (2L, 100L, t("2024-01-01 08:30:00")), // between → the 09:00 rows
      (3L, 100L, t("2024-01-01 10:00:00")), // after all → null
      (4L, 100L, t("2024-01-01 08:00:00"))  // exact boundary → inclusive
    ).toDF("lid", "k", "lt")
    val right = Seq(
      (10L, 100L, t("2024-01-01 08:00:00")),
      (11L, 100L, t("2024-01-01 09:00:00")),
      (12L, 100L, t("2024-01-01 09:00:00")) // tie on time → MIN rid wins
    ).toDF("rid", "k", "rt")
    val joined = AsOfJoin.joinAsOfForward(left, right, "k", "lt", "rt",
        "rid", Seq("rid"))
      .select(col("lid"), col("_asof_fwd.rid").as("matched"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any]("matched")))
      .toMap
    assert(joined(1L).contains(10L))
    assert(joined(2L).contains(11L), "tie at 09:00 must pick MIN rid")
    assert(joined(3L).isEmpty, "no later right row → null")
    assert(joined(4L).contains(10L), "boundary is inclusive")
  }

  test("nearest as-of picks the closer side; exact ties go backward") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, t("2024-01-01 08:20:00")), // 20m after A, 40m before B → A
      (2L, 100L, t("2024-01-01 08:50:00")), // 50m after A, 10m before B → B
      (3L, 100L, t("2024-01-01 08:30:00")), // equidistant → backward (A)
      (4L, 200L, t("2024-01-01 08:00:00"))  // only a later row → forward
    ).toDF("lid", "k", "lt")
    val right = Seq(
      (10L, 100L, t("2024-01-01 08:00:00")), // A
      (11L, 100L, t("2024-01-01 09:00:00")), // B
      (20L, 200L, t("2024-01-01 09:00:00"))
    ).toDF("rid", "k", "rt")
    val joined = AsOfJoin.joinAsOfNearest(left, right, "k", "lt", "rt",
        "rid", Seq("rid")) { (l, r) =>
        abs(unix_micros(l.cast("timestamp")) - unix_micros(r.cast("timestamp")))
      }
      .select(col("lid"), col("_asof_near.rid").as("matched"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("matched")).toMap
    assert(joined == Map(1L -> 10L, 2L -> 11L, 3L -> 10L, 4L -> 20L))
  }

  test("as-of join rejects fractional tiebreak types (would truncate)") {
    import spark.implicits._
    val left = Seq((1L, 9L, t("2024-01-01 08:00:00"))).toDF("lid", "k", "lt")
    val right = Seq((0.5, 9L, t("2024-01-01 08:00:00"))).toDF("rid", "k", "rt")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.joinAsOf(left, right, "k", "lt", "rt", "rid", Seq("rid"))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("as-of inclusive boundary: right row at exactly left time matches") {
    import spark.implicits._
    val left = Seq((1L, 9L, t("2024-01-01 08:00:00"))).toDF("lid", "k", "lt")
    val right = Seq((5L, 9L, t("2024-01-01 08:00:00"))).toDF("rid", "k", "rt")
    val joined = AsOfJoin.joinAsOf(left, right, "k", "lt", "rt", "rid",
        Seq("rid"))
      .select(col("_asof.rid")).head()
    assert(joined.getLong(0) == 5L)
  }

  test("reserved internal column names are rejected up front") {
    import spark.implicits._
    val left = Seq((1L, 100L, t("2024-01-01 10:00:00")))
      .toDF("lid", "k", "lt")
    val right = Seq((10L, 100L, t("2024-01-01 08:00:00")))
      .toDF("rid", "k", "rt")
    // a tag column on either side would be silently shadowed — rejected
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.joinAsOf(left.withColumn("_payload", lit(1)), right,
        "k", "lt", "rt", "rid", Seq("rid"))
    }
    assert(ex.getMessage.contains("_payload"))
    intercept[IllegalArgumentException] {
      AsOfJoin.joinAsOfForward(left, right.withColumn("_asof_fwd", lit(1)),
        "k", "lt", "rt", "rid", Seq("rid"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.joinAsOfNearest(left.withColumn("_asof_near", lit(1)), right,
        "k", "lt", "rt", "rid", Seq("rid"))((a, b) =>
        abs(unix_timestamp(a) - unix_timestamp(b)))
    }
    // the nearest composition itself (backward output carrying _asof
    // into the forward pass) must still be accepted
    val near = AsOfJoin.joinAsOfNearest(left, right, "k", "lt", "rt",
      "rid", Seq("rid"))((a, b) => abs(unix_timestamp(a) - unix_timestamp(b)))
    assert(near.select(col("_asof_near.rid")).head().getLong(0) == 10L)
  }
}
