package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
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
    assert(rows(1L) == 3L) // user 1: events 1,3 then 4
    assert(rows(2L) == 2L) // user 2: events 2 then 6
    assert(rows(3L) == 1L)
  }
}
