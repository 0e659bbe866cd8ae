package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.DecimalType

/** Typed event row matching the `events` table schema. */
final case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** One closed user session produced by the stateful sessionizer. */
final case class Session(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    total_value: Double)

// money is carried as exact integer cents so the emitted total is
// independent of merge order and equals a decimal-summing oracle
private final case class SessionInterval(
    start: Long, last: Long, n: Long, totalCents: Long)

private final case class SessionState(sessions: List[SessionInterval])

/** Running per-user spend held by [[SpendTracker]] — exact integer
  * cents (same convention as [[SessionInterval]]) so the final total
  * equals a decimal-summing oracle regardless of batch split/order. */
final case class SpendState(n: Long, cents: Long)

/** Per-user running spend via the Spark 4 arbitrary-state API
  * (`transformWithState` + `StatefulProcessor` on the RocksDB state
  * store — the successor of flatMapGroupsWithState that q94 uses).
  * One ValueState cell per user: each batch folds its rows into the
  * state and emits the running (n, cents), so the LAST emission per
  * key equals the batch aggregate over everything streamed — which is
  * what q147's oracle restates, and StreamingSpec's two-batch test
  * pins the cross-batch accumulation. Cents use scala BigDecimal's
  * double→decimal (valueOf) semantics, bit-matching Spark's
  * `CAST(value AS DECIMAL(18,2))`. */
final class SpendTracker
    extends StatefulProcessor[Long, (Long, Double), (Long, Long, Long)] {
  @transient private var state: ValueState[SpendState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[SpendState]("spend",
      org.apache.spark.sql.Encoders.product[SpendState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
                               timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val prev = if (state.exists()) state.get() else SpendState(0L, 0L)
    var n = prev.n
    var cents = prev.cents
    rows.foreach { case (_, v) =>
      n += 1
      cents += (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        * 100).toLongExact
    }
    state.update(SpendState(n, cents))
    Iterator.single((key, n, cents))
  }
}

/** [EXT] Structured Streaming surface (SURVEY.md §2.10 S14): the same
  * event-time shapes as the batch EventQueries, expressed as streaming
  * transforms. Each takes any DataFrame/Dataset (batch or streaming
  * source) so the logic is testable with MemoryStream and reusable over
  * `readStream` in production.
  *
  * Scale notes: watermarking bounds state (windows/dedup keys older than
  * the watermark are evicted); state is hash-partitioned on the grouping
  * key across executors — the 100 TB design is "state ∝ active keys ×
  * window horizon", never ∝ stream length.
  */
object EventStreams {

  /** Tumbling 1-hour windowed aggregation with a 10-minute watermark
    * (streaming form of q40). Append-mode emits only finalized windows. */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Exactly-once-per-key dedup bounded by the watermark: late duplicate
    * event_ids beyond 10 minutes are dropped from state. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Native streaming session windows (streaming form of q41). */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Custom sessionization with explicit state (U7's streaming sibling):
    * flatMapGroupsWithState keyed by user, 30-minute idle gap.
    *
    * State is a LIST of open session intervals, not a single one: late
    * events inside the watermark can arrive before, between, or bridging
    * existing sessions. Each event becomes a singleton interval, then
    * intervals within the gap of each other merge (extending session
    * start backward when a late event precedes it — a single-interval
    * formulation silently swallows such events into the wrong session).
    * Sessions emit only once the event-time watermark passes their close
    * (last + gap), so no further in-watermark event can reopen them. */
  def statefulSessions(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    val GapMs = 30L * 60 * 1000

    def normalize(intervals: List[SessionInterval]): List[SessionInterval] =
      intervals.sortBy(i => (i.start, i.last))
        .foldLeft(List.empty[SessionInterval]) {
          case (prev :: rest, cur) if cur.start <= prev.last + GapMs =>
            SessionInterval(prev.start, math.max(prev.last, cur.last),
              prev.n + cur.n, prev.totalCents + cur.totalCents) :: rest
          case (acc, cur) => cur :: acc
        }.reverse

    def fn(userId: Long, rows: Iterator[Event],
           state: GroupState[SessionState]): Iterator[Session] = {
      val existing = state.getOption.map(_.sessions).getOrElse(Nil)
      val incoming = rows.toList.map(e =>
        SessionInterval(e.ts.getTime, e.ts.getTime, 1,
          math.round(e.value * 100)))
      val merged = normalize(existing ++ incoming)
      val watermark = state.getCurrentWatermarkMs()
      // STRICT <: Spark invokes the timeout path only for states whose
      // timeoutTimestamp < watermark (equality does NOT fire), so a
      // session closing exactly at the watermark would sit in state
      // unvisited — the emission rule must match or such a session is
      // claimed closed by an <= rule yet never emitted
      val (closed, open) = merged.partition(_.last + GapMs < watermark)
      if (open.isEmpty) state.remove()
      else {
        state.update(SessionState(open))
        state.setTimeoutTimestamp(open.map(_.last).min + GapMs)
      }
      closed.sortBy(_.start).iterator.map(i =>
        Session(userId, new Timestamp(i.start),
          new Timestamp(i.last + GapMs), i.n, i.totalCents / 100.0))
    }

    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Stream-stream interval join: attribute each event of type
    * `effectType` to the same user's preceding `causeType` event within
    * `withinMinutes`. Both sides carry watermarks, so the join state for
    * a cause event is dropped once the effect-side watermark passes its
    * attribution window — state is bounded by (active users × window),
    * never by stream length. The time-range predicate is what makes the
    * state finite: an unconstrained stream-stream equi-join would have
    * to retain every row forever. */
  def attributionJoin(causes: DataFrame, effects: DataFrame,
                      causeType: String, effectType: String,
                      withinMinutes: Int,
                      watermark: String = "1 hour",
                      joinType: String = "inner"): DataFrame = {
    // NOTE each side's watermark tracks its FILTERED substream's max
    // event time (the filter is pushed below the watermark node either
    // way), so the global watermark is min over the two sides — a side
    // whose newest row lags the source lags the watermark with it.
    // Consumers reasoning about eviction boundaries (the outer join's
    // null emission) must use the filtered sides' max timestamps.
    val c = causes
      .filter(col("event_type") === causeType)
      .withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("cause_ts"),
        col("event_id").as("cause_id"))
    val e = effects
      .filter(col("event_type") === effectType)
      .withWatermark("ts", watermark)
      .select(col("user_id").as("e_user"), col("ts").as("effect_ts"),
        col("event_id").as("effect_id"))
    c.join(e,
        col("c_user") === col("e_user") &&
          col("effect_ts") >= col("cause_ts") &&
          col("effect_ts") <= col("cause_ts") +
            expr(s"INTERVAL $withinMinutes MINUTES"),
        joinType)
      .select(col("c_user").as("user_id"), col("cause_id"),
        col("effect_id"), col("cause_ts"), col("effect_ts"))
  }

  /** Stream-stream LEFT OUTER interval join: like [[attributionJoin]]
    * but a cause with no effect in its window is still emitted (null
    * effect) — once the watermark passes the cause's attribution window
    * and its state is evicted. The null-emission side is what makes
    * outer stream joins need the watermark: without the time bound
    * "no match yet" is undecidable. */
  def attributionJoinOuter(causes: DataFrame, effects: DataFrame,
                           causeType: String, effectType: String,
                           withinMinutes: Int,
                           watermark: String = "1 hour"): DataFrame =
    attributionJoin(causes, effects, causeType, effectType,
      withinMinutes, watermark, joinType = "leftOuter")

  /** [[SpendTracker]] wired onto an events frame (batch or streaming):
    * per-user running (n_events, cents) through transformWithState.
    * Requires the RocksDB state store provider (scoped by callers). */
  def runningSpend(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new SpendTracker, TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "n_events", "cents")
  }

  /** Run a streaming Dataset to completion against a memory sink and
    * return the accumulated result (test/tooling helper). */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
