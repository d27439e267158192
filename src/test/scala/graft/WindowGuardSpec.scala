package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LogicalWindow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Sessions

/** Guards the one global (un-partitioned) running window in the declared
  * surface (VERDICT r4 #7 / r5 next #4): events_lateness_histogram's
  * high-water-mark prefix max. A global window funnels ALL its input into
  * a single task, so it is only admissible over an input whose
  * cardinality is a grouped-aggregate domain (per-minute maxima — a year
  * of ingest is ~525k rows), never over raw events. Nothing in the
  * query's types enforces that: a future edit feeding raw rows through
  * the window would still be CORRECT, just concentrated on one core at
  * 100 TB. This spec pins (a) plan shape — the Window's input subtree
  * aggregates before any scan — and (b) cardinality — the window input
  * row count equals the aggregate's grouping domain, i.e. the collapse
  * actually happened.
  */
class WindowGuardSpec extends SparkSpec {

  test("events_lateness_histogram: global window input is the collapsed per-minute aggregate") {
    val df = SparkEntry.queries("events_lateness_histogram")(spark, sfDir)
    val analyzed = df.queryExecution.analyzed
    val windows = analyzed.collect { case w: LogicalWindow => w }
    assert(windows.size == 1, s"expected exactly one Window node:\n$analyzed")
    val win = windows.head
    // (a) An Aggregate sits between the Window and its input scan.
    assert(win.child.collect { case a: Aggregate => a }.nonEmpty,
      s"global window must consume an aggregate, not raw rows:\n${win.child}")
    // (b) Window input rows == the aggregate domain (distinct arrival
    // minutes): raw events feeding the window would read orders of
    // magnitude more rows than minutes.
    val winInput = Sessions.ofRows(spark, win.child)
    val inRows = winInput.count()
    val domain = winInput.select(countDistinct(col("arr_min"))).head().getLong(0)
    assert(inRows == domain,
      s"window input has $inRows rows but only $domain distinct minutes — " +
        "it is not the collapsed per-minute aggregate")
    val rawEvents = graft.sources.Tables.events(spark, sfDir).count()
    assert(inRows <= rawEvents,
      s"window input ($inRows) exceeds the raw event count ($rawEvents)")
  }
}
