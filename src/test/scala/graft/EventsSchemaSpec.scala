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

  test("every table loads with the columns the query packs depend on") {
    // the load-bearing column set per table: a driver-side testdata
    // regeneration that renames or drops one of these should fail HERE,
    // by table name, not as N opaque query failures
    val contract = Map(
      "region" -> Set("r_regionkey", "r_name"),
      "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Set("c_custkey", "c_name", "c_mktsegment", "c_nationkey"),
      "supplier" -> Set("s_suppkey", "s_nationkey"),
      "part" -> Set("p_partkey", "p_brand", "p_type", "p_size"),
      "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"),
      "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount", "l_returnflag"),
      "events" -> Set("event_id", "ts", "user_id", "event_type",
        "value", "props"),
      "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Set("vec_id", "embedding", "label"))
    val missing = contract.flatMap { case (t, cols) =>
      val have = Tables.load(spark, sf, t).columns.toSet
      val miss = cols -- have
      if (miss.isEmpty) None else Some(s"$t: missing ${miss.mkString(",")}")
    }
    assert(missing.isEmpty, missing.mkString("; "))
  }

  test("embeddings vectors are 64-dim float arrays (q64/q217 contract)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val e = Tables.load(spark, sf, "embeddings")
    assert(e.schema("embedding").dataType == ArrayType(FloatType, true) ||
      e.schema("embedding").dataType == ArrayType(FloatType, false),
      s"embedding dtype ${e.schema("embedding").dataType}")
    val dims = e.select(size(col("embedding")).as("d")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(dims == Set(64), s"expected uniform 64 dims, got $dims")
  }
}
