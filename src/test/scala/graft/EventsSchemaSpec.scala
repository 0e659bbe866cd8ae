package graft

import org.apache.spark.sql.types.{LongType, TimestampType}

/** Contract test for the events table's post-load schema.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * shipped events.ts as nanos-as-long parquet AND as microsecond
  * TIMESTAMP_NTZ. Tables.load must normalize every era to the same
  * post-load shape (ts: TimestampType, µs precision) so the 28 events
  * queries and the streaming surface are insensitive to the physical
  * encoding. If a future regeneration changes the dtype again, THIS spec
  * fails by name instead of 28 queries silently vanishing from the
  * correctness artifact (round-5 failure mode).
  */
class EventsSchemaSpec extends SparkSpec {

  test("events.ts loads as TimestampType regardless of physical parquet dtype") {
    val ev = Tables.load(spark, sf, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"expected TimestampType, got ${ev.schema("ts").dataType}")
    assert(ev.schema("ts").dataType != LongType)
  }

  test("events loads non-empty with the expected column set") {
    val ev = Tables.load(spark, sf, "events")
    val cols = ev.columns.toSet
    assert(cols.contains("ts"), s"missing ts in $cols")
    assert(ev.limit(1).count() == 1L, "events table is empty")
  }

  test("events.ts values are in a sane epoch range (not misdecoded ns/µs)") {
    import org.apache.spark.sql.functions._
    val r = Tables.load(spark, sf, "events")
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .head()
    val (lo, hi) = (r.getInt(0), r.getInt(1))
    // a ns value decoded as µs lands ~50,000 years out; µs decoded as ns
    // lands in 1970 — either way the year range leaves [1990, 2100]
    assert(lo >= 1990 && hi <= 2100, s"events year range [$lo,$hi] implausible")
  }
}
