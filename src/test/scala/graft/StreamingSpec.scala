package graft

import java.sql.Timestamp

import graft.streaming.{Event, EventStreams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming hourly stats finalize windows behind the watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0))
    // advance watermark far enough to close hour 0 and hour 1
    mem.addData(Event(4, ts(200), 3, "click", 1.0))
    mem.addData(Event(5, ts(400), 3, "click", 1.0))
    val out = EventStreams.runToMemory(
      spark, EventStreams.hourlyStats(mem.toDF()), "hourly_test")
    val rows = out.collect().map(r =>
      (r.getAs[Timestamp]("hour_start").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n")))
    assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L)))
    assert(rows.contains(("2024-01-01 01:00:00.0", "view", 1L)))
  }

  test("dropDuplicatesWithinWatermark removes in-window duplicate ids") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(1), 1, "click", 1.0),
      Event(1, ts(2), 1, "click", 1.0), // duplicate id within watermark
      Event(2, ts(3), 1, "view", 1.0))
    val out = EventStreams.runToMemory(
      spark, EventStreams.dedupedEvents(mem.toDF()), "dedup_test")
    assert(out.select("event_id").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L)))
  }

  test("streaming session windows merge events within the gap") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(10), 7, "click", 1.0),  // same session (10 < 30 gap)
      Event(3, ts(100), 7, "click", 1.0)) // new session
    mem.addData(Event(4, ts(500), 8, "click", 1.0)) // push watermark
    val out = EventStreams.runToMemory(
      spark, EventStreams.sessionWindows(mem.toDF()), "session_test")
    val u7 = out.filter(col("user_id") === 7).collect()
      .map(r => (r.getAs[Timestamp]("session_start").toString,
        r.getAs[Long]("n_events")))
    assert(u7.toSet == Set(("2024-01-01 00:00:00.0", 2L),
      ("2024-01-01 01:40:00.0", 1L)))
  }

  test("stateful flatMapGroupsWithState sessionizer closes on timeout") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 9, "click", 2.0),
      Event(2, ts(5), 9, "click", 3.0))
    mem.addData(Event(3, ts(300), 10, "click", 1.0)) // advance watermark
    mem.addData(Event(4, ts(600), 10, "click", 1.0)) // trigger timeout pass
    val sessions = EventStreams.statefulSessions(mem.toDS())
    val out = EventStreams.runToMemory(spark, sessions.toDF(), "stateful_test")
    val s9 = out.filter(col("user_id") === 9).collect()
    assert(s9.length == 1)
    assert(s9.head.getAs[Long]("n_events") == 2)
    assert(s9.head.getAs[Double]("total_value") == 5.0)
  }

  test("file-based readStream over parquet drives the same transform") {
    // S14 source surface: stream the events parquet as files (one batch),
    // run the identical windowed transform, compare against batch totals
    val batch = Tables.load(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    try {
      batch.write.mode("overwrite").parquet(dir.toString)
      val streamed = spark.readStream
        .schema(batch.schema)
        .parquet(dir.toString)
      val out = EventStreams.runToMemory(
        spark, EventStreams.hourlyStats(streamed), "file_stream_test")
      // append mode emits only windows closed by the watermark; totals of
      // emitted windows must match the batch aggregation for those windows
      val batchAgg = EventStreams.hourlyStats(batch)
        .collect().map(r => (r.getAs[java.sql.Timestamp]("hour_start"),
          r.getAs[String]("event_type")) -> r.getAs[Long]("n")).toMap
      val emitted = out.collect()
      assert(emitted.nonEmpty)
      emitted.foreach { r =>
        val k = (r.getAs[java.sql.Timestamp]("hour_start"),
          r.getAs[String]("event_type"))
        assert(batchAgg(k) == r.getAs[Long]("n"), s"window $k mismatch")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("stateful sessionizer merges a late in-watermark event backward") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    // batch 1: event at minute 20 (watermark will trail by 30 min)
    mem.addData(Event(1, ts(20), 11, "click", 1.0))
    // batch 2: LATE event at minute 10 — earlier than the open session's
    // start but within the watermark; must extend the session backward
    mem.addData(Event(2, ts(10), 11, "click", 2.0))
    // advance watermark far enough to close user 11's session
    mem.addData(Event(3, ts(300), 12, "click", 0.0))
    mem.addData(Event(4, ts(600), 12, "click", 0.0))
    val out = EventStreams.runToMemory(
      spark, EventStreams.statefulSessions(mem.toDS()).toDF(), "late_test")
    val s11 = out.filter(col("user_id") === 11).collect()
    assert(s11.length == 1, s"expected one merged session, got ${s11.length}")
    assert(s11.head.getAs[java.sql.Timestamp]("session_start").toString
      == "2024-01-01 00:10:00.0", "session start must extend to the late event")
    assert(s11.head.getAs[Long]("n_events") == 2)
    assert(s11.head.getAs[Double]("total_value") == 3.0)
  }

  test("stream-stream interval join matches events within the time bound") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    // buys attributed to a view by the same user within the prior 30 min
    val joined = EventStreams.attributionJoin(
      views.toDF(), buys.toDF(), "view", "buy", withinMinutes = 30)
    views.addData(Event(1, ts(0), 1, "view", 0), Event(2, ts(0), 2, "view", 0))
    buys.addData(
      Event(10, ts(10), 1, "buy", 5.0),   // within 30 min of view 1
      Event(11, ts(100), 2, "buy", 5.0))  // outside the window for view 2
    val out = EventStreams.runToMemory(spark, joined, "ss_join_test")
    val pairs = out.collect().map(r =>
      (r.getAs[Long]("cause_id"), r.getAs[Long]("effect_id")))
    assert(pairs.toSet == Set((1L, 10L)), s"got ${pairs.toSeq}")
  }

  test("attribution join over the batch events table is non-trivial") {
    // the same transform runs over a batch frame; 'click' causes with
    // 'purchase' effects within 30 minutes per user
    val batch = Tables.load(spark, sf, "events")
    val types = batch.select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types.size >= 2, s"need 2+ event types, got $types")
    val Seq(a, b) = types.toSeq.sorted.take(2)
    val out = EventStreams.attributionJoin(batch, batch, a, b, 30)
    assert(out.columns.toSeq == Seq("user_id", "cause_id", "effect_id",
      "cause_ts", "effect_ts"))
    // every attributed effect is within the window and after the cause
    val bad = out.filter(col("effect_ts") < col("cause_ts") ||
      col("effect_ts") > col("cause_ts") + expr("INTERVAL 30 MINUTES")).count()
    assert(bad == 0)
  }

  test("checkpointed file sink is exactly-once across restart") {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val in = base.resolve("in"); val out = base.resolve("out")
    val cp = base.resolve("cp")
    val events = Tables.load(spark, sf, "events")
    def runOnce(): Unit = {
      val q = spark.readStream.schema(events.schema)
        .parquet(in.toString)
        .writeStream
        .format("parquet")
        .option("checkpointLocation", cp.toString)
        .option("path", out.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    try {
      events.filter(col("event_id") % 2 === 0)
        .write.mode("append").parquet(in.toString)
      runOnce()
      events.filter(col("event_id") % 2 === 1)
        .write.mode("append").parquet(in.toString)
      runOnce() // restart from checkpoint: must process ONLY the new files
      val got = spark.read.parquet(out.toString)
      assert(got.count() == events.count(),
        "restart reprocessed or dropped data")
      assert(got.select("event_id").distinct().count() == events.count())
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("batch q40/q41 equivalents match streaming output shapes") {
    // the streaming transforms run unchanged over batch frames
    val batch = Tables.load(spark, sf, "events")
    val hourly = EventStreams.hourlyStats(batch)
    assert(hourly.columns.toSeq ==
      Seq("hour_start", "event_type", "n", "total_value"))
    assert(hourly.count() > 0)
  }

  test("transformWithState accumulates per-key state across micro-batches") {
    graft.util.LocalFrame.withConf(spark,
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      implicit val sq = spark.sqlContext
      import spark.implicits._
      val mem = MemoryStream[Event]
      val q = EventStreams.runningSpend(mem.toDF()).writeStream
        .format("memory").queryName("tws_test")
        .outputMode("append").start()
      try {
        mem.addData(
          Event(1, ts(1), 1, "click", 1.25),
          Event(2, ts(2), 1, "view", 2.50),
          Event(3, ts(3), 2, "click", 5.00))
        q.processAllAvailable()
        mem.addData(Event(4, ts(4), 1, "click", 3.00))
        q.processAllAvailable()
      } finally q.stop()
      // batch 1 emits running (user 1 → 2 events/375¢, user 2 → 500¢);
      // batch 2 folds user 1's third event onto the RESTORED state
      val rows = spark.table("tws_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      spark.catalog.dropTempView("tws_test")
      assert(rows == Set((1L, 2L, 375L), (2L, 1L, 500L), (1L, 3L, 675L)))
    }
  }
}
