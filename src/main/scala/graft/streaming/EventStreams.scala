package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Structured Streaming over the `events` stream shape
  * (event_id, ts, user_id, event_type, value) — a beyond-reference
  * extension (the reference has no streaming surface, SURVEY §2.9).
  *
  * Every transform takes a DataFrame/Dataset and works identically on a
  * batch frame or a `readStream` source — the Spark contract that makes
  * the pipeline testable in batch and deployable as a stream.
  */
// Serializable: local defs passed to flatMapGroupsWithState (sessionize's
// `update`) reference module methods like tsMicros directly, so the lifted
// closure captures the module instance — which then rides along in the
// serialized task closure.
object EventStreams extends Serializable {

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(
      user_id: Long, n_events: Int, start: java.sql.Timestamp,
      end: java.sql.Timestamp, total_value: Double)

  /** Full-microsecond instant of a Timestamp. `getTime` alone is
    * millisecond precision — on µs-grained data, same-millisecond events
    * would fold in event_id order instead of the oracle's
    * `ORDER BY ts, event_id` (double addition is order-sensitive, so the
    * sums drift). Note `getTime` already INCLUDES the integral
    * milliseconds of the nanos fraction — hence whole-seconds × 1e6 +
    * nanos/1000, not `getTime*1000 + getNanos/1000`, which would
    * double-count the millis and be non-monotonic across seconds.
    */
  private[graft] def tsMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  /** Watermarked tumbling-window counts/sums per event type. */
  def tumblingAgg(
      events: DataFrame,
      windowLen: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window moving aggregate (overlapping windows). */
  def slidingAgg(
      events: DataFrame,
      windowLen: String = "10 minutes",
      slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
      .select(col("window.start").as("bucket"), col("n"), col("avg_value"))

  /** At-most-once event delivery: drop duplicate event ids arriving
    * within the watermark horizon (state is bounded by the watermark,
    * unlike a plain dropDuplicates whose state grows forever).
    */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: join the event stream against a static
    * dimension (broadcast — no stream-side shuffle).
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval self-join: each click matched to same-user
    * purchases within `windowSeconds` after it. Watermarks on both sides
    * bound the join state (without them the state store grows forever).
    */
  def clickToPurchase(
      events: DataFrame,
      windowSeconds: Long = 600,
      watermark: String = "10 minutes"): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(
      purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(
        col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Event-time sessionization with a gap timeout, via
    * flatMapGroupsWithState: state is the open session per user; an
    * event beyond the gap closes and emits the previous session; event-
    * time timeout (watermark passing last+gap) flushes the remainder.
    */
  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800,
      watermark: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(
        userId: Long,
        batch: Iterator[Event],
        state: GroupState[Session]): Iterator[Session] = {
      val gapUs = gapSeconds * 1000000L
      var open = state.getOption
      val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
      if (state.hasTimedOut) {
        open.foreach(closed += _)
        state.remove()
        return closed.iterator
      }
      // (µs ts, event_id) — full-microsecond key + event_id tiebreak pins
      // the fold order to the oracle's ORDER BY ts, event_id; the gap
      // comparison is also in µs so a gap of exactly 1800s + a fraction
      // of a millisecond splits sessions the same way the oracle does.
      batch.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
        open match {
          case Some(s) if tsMicros(e.ts) - tsMicros(s.end) <= gapUs =>
            open = Some(Session(
              userId, s.n_events + 1, s.start, e.ts, s.total_value + e.value))
          case Some(s) =>
            closed += s
            open = Some(Session(userId, 1, e.ts, e.ts, e.value))
          case None =>
            open = Some(Session(userId, 1, e.ts, e.ts, e.value))
        }
      }
      open match {
        case Some(s) =>
          state.update(s)
          // Timeout is ms-granular but the gap comparison is µs-granular:
          // ceil the µs deadline to the next millisecond so the session
          // can never time out before the full µs gap has elapsed (a
          // floor would close up to ~1ms early, splitting a session the
          // oracle's ORDER BY ts fold would extend).
          state.setTimeoutTimestamp(
            Math.floorDiv(tsMicros(s.end) + gapSeconds * 1000000L + 999, 1000))
        case None => ()
      }
      closed.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Declarative sessionization via the built-in `session_window` — the
    * Spark-first path when per-session logic is pure aggregation (gap
    * merging, counts, sums): Catalyst owns the state store, merges
    * overlapping sessions, and closes them at the watermark, with no
    * user state-management code. [[sessionize]] remains for semantics a
    * session aggregate can't express (e.g. emitting mid-session).
    */
  def sessionWindowAgg(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"),
        col("n_events"), col("total_value"))

  final case class ThresholdAlert(user_id: Long, total_value: Double, n_events: Long)

  /** Per-key running totals with threshold alerts via `transformWithState`
    * (the Spark 4 arbitrary-state API, successor to
    * [flat]mapGroupsWithState): cumulative value and event count live in
    * `ValueState`; an alert row is emitted each time a user's running
    * total crosses another multiple of `threshold`. Requires the RocksDB
    * state store provider
    * (`spark.sql.streaming.stateStore.providerClass`).
    */
  class ThresholdProcessor(threshold: Double)
      extends StatefulProcessor[Long, Event, ThresholdAlert] {
    @transient private var totals: org.apache.spark.sql.streaming.ValueState[(Double, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Double, Long)](
        "totals", Encoders.product[(Double, Long)], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Event],
        timerValues: TimerValues): Iterator[ThresholdAlert] = {
      var (total, n) = if (totals.exists()) totals.get() else (0.0, 0L)
      val alerts = scala.collection.mutable.ArrayBuffer.empty[ThresholdAlert]
      // full-µs fold order — see [[tsMicros]]; the oracle's prefix sums
      // are built over list(value ORDER BY ts, event_id)
      rows.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
        val crossed = math.floor((total + e.value) / threshold).toLong -
          math.floor(total / threshold).toLong
        total += e.value
        n += 1
        if (crossed > 0) alerts += ThresholdAlert(key, total, n)
      }
      totals.update((total, n))
      alerts.iterator
    }
  }

  def thresholdAlerts(
      events: Dataset[Event],
      threshold: Double = 100.0): Dataset[ThresholdAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new ThresholdProcessor(threshold),
        TimeMode.None(),
        OutputMode.Append())
  }

  /** Idempotent micro-batch sink: partition the output by batch id and
    * overwrite dynamically, so a replayed batch (checkpoint recovery,
    * retried epoch) rewrites its own partition instead of appending
    * duplicates — exactly-once table semantics over a plain parquet dir.
    * Wire as `stream.writeStream.foreachBatch(writeBatchIdempotent(path) _)`.
    */
  def writeBatchIdempotent(path: String)(batch: DataFrame, batchId: Long): Unit = {
    batch
      .withColumn("__batch_id", lit(batchId))
      .write
      // per-write option, NOT spark.conf.set: a session-level mutation
      // would silently flip overwrite semantics for every other
      // partitioned write sharing this session.
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("__batch_id")
      .parquet(path)
  }
}
