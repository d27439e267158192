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

  /** One open session's summary: event-time span plus count/sum. */
  case class SessionSpan(startMs: Long, endMs: Long, n: Long, sum: Double)

  /** Per-user state: ALL sessions that are still extendable — a session
    * is only immutable once the watermark passes `end + gap`, so any
    * within-watermark disorder (late events landing in, bridging, or
    * preceding earlier sessions) must find its session still here. The
    * list length is bounded by the watermark horizon / gap, not by the
    * stream length. */
  case class SessionsState(sessions: Seq[SessionSpan])

  /** Long-nanos events frame → typed timestamp frame (micros precision). */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("ts", timestamp_micros(graft.functions.ColFns.floorDiv(col("ts"), 1000L)))

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
      // decSum2, not sum: the batch twin (eventsTumblingAgg) sums in
      // decimal so the result is independent of partition/micro-batch
      // addition order — double sums can differ in the last ulp and fail
      // exact batch/stream comparison.
      .agg(count(lit(1)).as("n"),
           graft.functions.ColFns.decSum2(col("value")).as("sum_value"))
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
    * static dimension frame (e.g. the customer table). UNHINTED — the
    * repo-wide 100 TB broadcast rule (BroadcastGuardSpec, streaming
    * arm): `dim` is caller-supplied, so its cardinality is a caller
    * property this builder cannot bound; the planner elects a
    * per-micro-batch broadcast from the static side's own size stats
    * whenever it is actually dimension-sized (the standard enrichment
    * shape — and what happens for any catalog table), while a
    * corpus-cardinality frame degrades to a shuffled stream-static
    * join instead of pinning itself to the driver. */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String, dimKey: String): DataFrame =
    // Drop the dimension's copy of the join key: when eventKey == dimKey
    // the duplicate name would make every downstream col(key) reference
    // ambiguous at analysis time.
    events.join(dim, events(eventKey) === dim(dimKey), "left_outer")
      .drop(dim(dimKey))

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

  /** Stateful sessionization: per-user event-time gap sessions (count +
    * value sum) via KeyValueGroupedDataset.flatMapGroupsWithState with
    * explicit GroupState — the Spark-native form of custom keyed
    * streaming state.
    *
    * The state is the LIST of still-extendable sessions, not a single
    * running one: within the watermark, events may arrive in ANY order
    * across micro-batches, so an arriving event can land inside an
    * earlier session, extend one, bridge two into one (merge), or open a
    * new one — and the result must equal the batch `events_sessionized`
    * gap rule regardless of arrival order or trigger boundaries. (The
    * previous single-session state silently merged an earlier session
    * into a later one whenever the earlier events arrived late — a
    * confirmed order-dependence.)
    *
    * A session is emitted `closed` ONLY once the watermark passes
    * `end + gap`: before that, a late-but-admissible event could still
    * extend or bridge it, and an Update-mode closed row cannot be
    * retracted. Closure happens on whichever comes first of the data
    * path (watermark already past while other events arrive) or the
    * event-time timeout set at min(end)+gap over open sessions —
    * deterministic under replay, no wall clock. `lateness` is the
    * watermark delay: events older than the global max event time minus
    * this are dropped by Spark before reaching the state function, which
    * is exactly what bounds the open-session list. Each data batch also
    * emits a closed=false progress row for the user's latest open
    * session. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 lateness: String = "10 minutes"): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def split(wm: Long, sessions: List[SessionSpan]) =
      sessions.partition(s => wm > s.endMs + gapMs)

    def finish(state: GroupState[SessionsState], wm: Long,
               open: List[SessionSpan]): Unit =
      if (open.isEmpty) state.remove()
      else {
        state.update(SessionsState(open))
        // min over open ends: the earliest session to become immutable.
        // Guard wm+1: setTimeoutTimestamp rejects ts <= current watermark
        // (possible when end+gap == wm exactly); firing a tick late is
        // harmless, closing early is not.
        state.setTimeoutTimestamp(math.max(open.map(_.endMs).min + gapMs, wm + 1L))
      }

    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsState, SessionUpdate](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionsState]) =>
          val wm = state.getCurrentWatermarkMs()
          var sessions = state.getOption.map(_.sessions.toList).getOrElse(Nil)
          if (state.hasTimedOut) {
            val (done, open) = split(wm, sessions)
            finish(state, wm, open)
            done.iterator.map(s => SessionUpdate(userId, s.n, s.sum, closed = true))
          } else {
            // Fold each event in: merge every session within `gap` of it
            // (an event can bridge at most two, but folding the overlap
            // set handles any chain). Event order within the batch does
            // not matter — the final partition is the transitive closure
            // of the within-gap relation — but sort for determinism of
            // intermediate sums.
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              val (overlap, rest) =
                sessions.partition(s => t >= s.startMs - gapMs && t <= s.endMs + gapMs)
              val merged = overlap.foldLeft(SessionSpan(t, t, 1L, e.value)) { (a, s) =>
                SessionSpan(math.min(a.startMs, s.startMs), math.max(a.endMs, s.endMs),
                  a.n + s.n, a.sum + s.sum)
              }
              sessions = merged :: rest
            }
            val (done, open) = split(wm, sessions)
            finish(state, wm, open)
            val progress = open.sortBy(_.endMs).lastOption
              .map(s => SessionUpdate(userId, s.n, s.sum, closed = false))
            (done.map(s => SessionUpdate(userId, s.n, s.sum, closed = true)) ++
              progress).iterator
          }
      }
  }
}
