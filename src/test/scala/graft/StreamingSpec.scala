package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{DocStreams, EventStreams}
import graft.streaming.EventStreams.Event

/** Streaming specs: the same transformation runs over a MemoryStream
  * (streaming) and a batch frame, and the windowed results agree — the
  * batch/stream unification claim, tested rather than asserted.
  */
class StreamingSpec extends SparkSpec {

  import TestSpark.spark.implicits._

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private val sample = Seq(
    Event(1, ts(0, 10), 1, "click", 1.0),
    Event(2, ts(0, 20), 2, "click", 2.0),
    Event(3, ts(0, 40), 1, "purchase", 10.0),
    Event(4, ts(1, 5), 1, "click", 3.0),
    Event(5, ts(1, 30), 3, "error", 0.5),
    Event(6, ts(2, 15), 2, "click", 4.0))

  /** Events as the long-nanos frame the batch tables use. */
  private def asNanosFrame(events: Seq[Event]) =
    events.toDF().withColumn("ts", $"ts".cast("long") * 1000000000L)

  test("streaming tumbling agg over MemoryStream matches batch run") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val streamed = EventStreams.tumblingAgg(
      mem.toDF().withColumn("ts", $"ts".cast("long") * 1000000000L))
    val q = streamed.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      // watermark: append emits only finalized windows; push one far-future
      // event to close all sample windows
      mem.addData(Event(99, ts(20, 0), 9, "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamRows = spark.table("tumbling")
      .select("window_start", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet
    val batchRows = EventStreams.tumblingAgg(asNanosFrame(sample))
      .collect().map(_.toSeq).toSet
    assert(batchRows.subsetOf(streamRows), s"stream=$streamRows batch=$batchRows")
    assert(streamRows.nonEmpty)
  }

  test("stream-static join enriches events against a static dimension") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("cust_id", "tier")
    val mem = MemoryStream[Event]
    val enriched = EventStreams.enrich(mem.toDF(), dim, "user_id", "cust_id")
      .select(col("event_id"), col("user_id"), col("tier"))
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("enriched").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)))).toMap
    assert(rows(1L).contains("gold"))   // user 1 -> gold
    assert(rows(5L).isEmpty)            // user 3 has no dim row
    assert(rows.size == sample.length)
  }

  test("streaming dedup suppresses duplicate event_ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.dedupEvents(
        mem.toDF().withColumn("ts", $"ts".cast("long") * 1000000000L))
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      mem.addData(sample.take(3): _*) // replay first three events
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("deduped").select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == sample.map(_.event_id).sorted, s"got $ids")
  }

  test("stream-stream interval join pairs errors with prior same-user actions") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // user 3: click at 1:10, error at 1:30 (within 30 min lookback) and a
    // click at 0:30 (outside); user 1's events must not pair with it.
    val events = Seq(
      Event(10, ts(0, 30), 3, "click", 1.0),
      Event(11, ts(1, 10), 3, "click", 1.0),
      Event(12, ts(1, 30), 3, "error", 0.0),
      Event(13, ts(1, 20), 1, "click", 1.0))
    val mem = MemoryStream[Event]
    val joined = EventStreams.errorContext(
      mem.toDF().withColumn("ts", $"ts".cast("long") * 1000000000L))
    val q = joined.writeStream.format("memory").queryName("error_ctx")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      // advance both watermarks past the pairs so append emits them
      mem.addData(Event(99, ts(20, 0), 9, "click", 0.0),
                  Event(98, ts(20, 1), 9, "error", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("error_ctx")
      .select(col("error_id"), col("action_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((12L, 11L)), s"expected (12,11) in $pairs") // in window
    assert(!pairs.contains((12L, 10L)), "action outside lookback must not pair")
    assert(!pairs.contains((12L, 13L)), "other user's action must not pair")
    // streaming result matches the batch run of the same transformation
    val batch = EventStreams.errorContext(asNanosFrame(events))
      .select(col("error_id"), col("action_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.subsetOf(pairs + ((98L, 99L))), s"batch=$batch stream=$pairs")
  }

  test("streaming ingestion pipeline gates, dedups, hash-retains, and counts documents") {
    implicit val sqlCtx = spark.sqlContext
    // Retention buckets (md5Long(normDigest(text)) % 100, threshold < 50)
    // precomputed for these texts: `good` = 92 (retention-DROPPED),
    // `kept` = 33 (kept), doc 5's de text = 39 (kept) — so the en window
    // exercises all three drop reasons (gate, dedup, retention) and one
    // survivor, matching the batch pipeline_clean_corpus stages.
    val good = "the quick brown fox jumps over the lazy dog again and again today"
    val kept = "red orange yellow green blue indigo violet crimson amber teal navy plum"
    val short = "too short"
    val repet = Seq.fill(20)("spam").mkString(" ") // fails distinct-ratio gate
    case class Doc(doc_id: Long, lang: String, text: String, ingest_ts: Timestamp)
    val docs = Seq(
      Doc(1, "en", good, ts(0, 10)),  // survives gate+dedup, retention-dropped
      Doc(6, "en", kept, ts(0, 15)),  // the en survivor
      Doc(2, "en", kept, ts(0, 20)),  // exact duplicate of 6: dedup drop
      Doc(3, "en", short, ts(0, 25)), // length gate
      Doc(4, "de", repet, ts(0, 30)), // distinct-ratio gate
      Doc(5, "de", good + " und noch ein paar mehr deutsche worte dazu", ts(0, 40)))
    val mem = MemoryStream[(Long, String, String, Timestamp)]
    val streamDf = mem.toDF().toDF("doc_id", "lang", "text", "ingest_ts")
    // retainPct = 50 opts into the batch pipeline_clean_corpus retention
    // stage (the library default 100 keeps everything).
    val q = DocStreams.pipeline(streamDf, retainPct = 50).writeStream
      .format("memory").queryName("doc_pipeline")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(docs.map(d => (d.doc_id, d.lang, d.text, d.ingest_ts)): _*)
      q.processAllAvailable()
      mem.addData((99L, "en", good + " closing marker document arrives much later now", ts(20, 0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("doc_pipeline")
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    // en: only doc 6 survives (1 retention-dropped, 2 deduped, 3 gated)
    assert(rows("en") == ((1L, 12L)), s"got $rows")
    // de: doc 5 survives (distinct text, kept bucket); repetitive 4 gated
    assert(rows("de") == ((1L, 21L)), s"got $rows")
  }

  test("streaming decontamination flags only docs overlapping the eval set") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // eval set = shingles of one benchmark sentence
    val evalShingles = Seq("the quick brown", "quick brown fox", "brown fox jumps")
      .toDF("s")
    val contaminated = "today the quick brown fox appeared" // shares 2 shingles
    val clean = "completely unrelated words about distributed query engines"
    val tooShort = "the quick" // < 3 words, gated before shingling
    val mem = MemoryStream[(Long, String, Timestamp)]
    val streamDf = mem.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = DocStreams.decontaminate(streamDf, evalShingles).writeStream
      .format("memory").queryName("decontam")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, contaminated, ts(0, 10)), (2L, clean, ts(0, 20)),
                  (3L, tooShort, ts(0, 25)))
      q.processAllAvailable()
      // advance the watermark past the sample so append finalizes
      mem.addData((99L, clean, ts(20, 0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("decontam")
      .select(col("doc_id"), col("n_shared"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 2L), s"got $rows")
  }

  test("sessionize accumulates per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS()).writeStream
      .format("memory").queryName("sessions")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(sample.take(3): _*)
      q.processAllAvailable()
      mem.addData(sample.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sessions")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_events").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == 3L) // user 1: 0:10, 0:40, 1:05 — all gaps <= 30 min
    // user 2: 0:20 then 2:15 — the 115-min gap SPLITS even though both
    // events arrive before any timeout fires (data-path gap splitting,
    // matching the batch events_sessionized semantics)
    assert(rows(2L) == 1L)
    assert(rows(3L) == 1L)
    val closed = spark.table("sessions")
      .filter(org.apache.spark.sql.functions.col("closed"))
      .collect().map(r => r.getLong(0))
    assert(closed.contains(2L), "user 2's first session must emit as closed")
  }

  test("lateness-histogram rule predicts exactly what the watermark drops") {
    // The batch events_lateness_histogram diagnostic claims: an event's
    // lateness vs the event-time high-water mark at ARRIVAL decides its
    // fate under a watermark. Cross-validate: feed events one micro-batch
    // at a time (so the watermark advances between arrivals), and assert
    // the streaming result equals the batch aggregate over exactly the
    // events the batch-side rule predicts are kept.
    implicit val sqlCtx = spark.sqlContext
    val wmMin = 30L // watermark "30 minutes"
    val arrivalOrder = Seq( // (event, predicted fate under 1h windows)
      Event(1, ts(0, 5), 1, "click", 1.0),   // hwm=-        kept
      Event(2, ts(3, 0), 1, "click", 2.0),   // hwm 00:05    kept; wm → 02:30
      Event(3, ts(1, 10), 1, "click", 4.0),  // windowEnd 02:00 <= 02:30 → DROPPED
      Event(4, ts(2, 50), 1, "click", 8.0))  // windowEnd 03:00 >  02:30 → kept
    // batch-side replay of the rule (same hwm device as the declared query)
    var hwmMs = Long.MinValue
    val predictedKept = arrivalOrder.filter { e =>
      val keep = hwmMs == Long.MinValue ||
        { val windowEndMs = (e.ts.getTime / 3600000L + 1) * 3600000L
          windowEndMs > hwmMs - wmMin * 60000L }
      hwmMs = math.max(hwmMs, e.ts.getTime)
      keep
    }
    assert(predictedKept.map(_.event_id) == Seq(1L, 2L, 4L)) // scenario sanity
    val mem = MemoryStream[Event]
    val streamed = EventStreams.tumblingAgg(
      mem.toDF().withColumn("ts", $"ts".cast("long") * 1000000000L),
      watermark = s"$wmMin minutes")
    val q = streamed.writeStream.format("memory").queryName("late_check")
      .outputMode(OutputMode.Append()).start()
    try {
      arrivalOrder.foreach { e => mem.addData(e); q.processAllAvailable() }
      mem.addData(Event(99, ts(20, 0), 9, "click", 0.0)) // close all windows
      q.processAllAvailable()
    } finally q.stop()
    val streamRows = spark.table("late_check")
      .filter($"window_start" < ts(19, 0))
      .select("window_start", "n", "sum_value").collect().map(_.toSeq).toSet
    val batchRows = EventStreams.tumblingAgg(asNanosFrame(predictedKept))
      .select("window_start", "n", "sum_value").collect().map(_.toSeq).toSet
    assert(streamRows == batchRows,
      s"histogram rule mispredicts the watermark: stream=$streamRows predicted=$batchRows")
  }
}
