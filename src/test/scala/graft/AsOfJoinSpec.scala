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
}
