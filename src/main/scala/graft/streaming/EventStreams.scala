package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the event operators.
  *
  * The reference is batch-synchronous only (its `sync()` is a blocking
  * collective, SURVEY §2.2), so these are pure extensions: the same
  * tumbling-window aggregate the batch query declares, plus stateful
  * sessionization via flatMapGroupsWithState. Transformations are
  * source-agnostic — they accept any DataFrame with the events schema, so
  * the identical plan runs over `spark.readStream` in production and over
  * a MemoryStream in tests, or over a batch frame for backfill (the
  * batch/streaming unification Spark gives for free).
  *
  * Scale notes: the window aggregate shuffles once on (window, type) with
  * watermark-bounded state; sessionization keys state by user_id with a
  * processing-time timeout so abandoned sessions are evicted rather than
  * accumulating forever.
  */
object EventStreams {

  /** Input shape: the events table with ts as a proper timestamp. */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionUpdate(user_id: Long, n_events: Long, sum_value: Double,
                           closed: Boolean)

  /** Session state: running count/sum plus the max event time seen, so an
    * out-of-order (but not watermark-late) event cannot move the timeout
    * backward. */
  case class SessionState(n: Long, sum: Double, maxTsMillis: Long)

  /** Long-nanos events frame → typed timestamp frame (micros precision). */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("ts", timestamp_micros(call_function("div", col("ts"), lit(1000L))))

  /** Tumbling 1-hour window counts/sums per event type, watermark-bounded
    * late data (default 2 h — size it from the batch
    * `events_lateness_histogram` diagnostic: the histogram's tail bucket
    * is the lateness the watermark must cover, and StreamingSpec
    * cross-validates that prediction against actual drop behavior).
    * Append mode emits each window once it is final. */
  def tumblingAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    withEventTime(events)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Streaming exact dedup on event_id — the streaming form of the dedup
    * family. dropDuplicatesWithinWatermark keeps only watermark-bounded
    * state (plain dropDuplicates on a stream would grow keys forever);
    * duplicates arriving within the watermark window are suppressed,
    * later ones are the upstream's replay responsibility. */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: join the live event stream against a
    * static dimension frame (e.g. the customer table). Spark plans the
    * static side as a broadcast rebuilt per micro-batch — no streaming
    * state, the standard shape for dimension enrichment at scale. */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String, dimKey: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim),
      events(eventKey) === dim(dimKey), "left_outer")

  /** Stream-stream interval join — the streaming form of the batch
    * `events_error_window_join` (RangeJoin): each error event pairs with
    * the same user's non-error actions in the preceding `lookbackMinutes`.
    * Both sides carry watermarks and the join condition bounds event time
    * on both sides, so Spark derives a state-eviction bound for each side
    * — the state store holds only the lookback window per key, the
    * requirement for an unbounded run. Inner join: emitted once both
    * watermarks pass the pair. */
  def errorContext(events: DataFrame, lookbackMinutes: Int = 30,
                   watermark: String = "1 hour"): DataFrame = {
    val typed = withEventTime(events)
    val errors = typed.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
              col("event_id").as("error_id"))
      .withWatermark("e_ts", watermark)
    val actions = typed.filter(col("event_type") =!= "error")
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
              col("event_id").as("action_id"), col("event_type").as("action_type"))
      .withWatermark("a_ts", watermark)
    errors.join(actions,
      col("e_user") === col("a_user") &&
        col("a_ts") <= col("e_ts") &&
        col("a_ts") >= col("e_ts") - expr(s"INTERVAL $lookbackMinutes MINUTES"))
      .select(col("error_id"), col("e_user").as("user_id"), col("e_ts"),
              col("action_id"), col("action_type"), col("a_ts"))
  }

  /** Stateful sessionization: per-user running session (count + value sum)
    * that closes after `gapMinutes` of event-time inactivity —
    * KeyValueGroupedDataset.flatMapGroupsWithState with explicit
    * GroupState, the Spark-native form of custom keyed streaming state.
    *
    * Gap splitting happens on BOTH paths: the event-time timeout closes a
    * session when no data arrives for the key (watermark passes the gap),
    * AND the data path splits when an arriving event's time is more than
    * the gap past the session's max — a timeout alone would silently merge
    * sessions whose events arrive in the same micro-batch, making results
    * depend on trigger boundaries instead of event time (the batch
    * `events_sessionized` query splits purely on event-time gaps; this
    * matches it). Events are sorted by event time within the batch so
    * splitting is deterministic.
    *
    * Timeouts are event-time based: deterministic under replay and
    * testable without a wall clock. The timeout is set from the maximum
    * event time the session has EVER seen (carried in state), not the
    * current batch's max — an out-of-order (but within-`lateness`) batch
    * must not shrink the session's lifetime. `lateness` is the watermark
    * delay: events older than the global max event time minus this are
    * dropped by Spark before reaching the state function. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 lateness: String = "10 minutes"): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events.withWatermark("ts", lateness)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, st.n, st.sum, closed = true))
          } else {
            val out = Seq.newBuilder[SessionUpdate]
            var st = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              if (st.maxTsMillis != Long.MinValue && t - st.maxTsMillis > gapMs) {
                out += SessionUpdate(userId, st.n, st.sum, closed = true)
                st = SessionState(0L, 0.0, Long.MinValue)
              }
              st = SessionState(st.n + 1, st.sum + e.value,
                math.max(st.maxTsMillis, t))
            }
            state.update(st)
            if (st.maxTsMillis != Long.MinValue)
              state.setTimeoutTimestamp(st.maxTsMillis + gapMs)
            out += SessionUpdate(userId, st.n, st.sum, closed = false)
            out.result().iterator
          }
      }
  }
}
