package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LogicalWindow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Sessions

/** Guards the running-window discipline of events_lateness_histogram's
  * high-water-mark prefix max (VERDICT r4 #7 / r5 next #4 / r9 watch
  * item #1). A global window funnels ALL its input into a single task,
  * so the construction is two-level: a per-DAY-partitioned window over
  * per-minute maxima (largest partition ≤ 1440 rows by construction)
  * plus one formally-global window whose input is ONE ROW PER CALENDAR
  * DAY — bounded by elapsed time, never by data volume. Nothing in the
  * query's types enforces either collapse: a future edit feeding raw
  * rows through a window would still be CORRECT, just concentrated on
  * one core at 100 TB. This spec pins (a) plan shape — every Window's
  * input subtree aggregates before any scan, and exactly one window is
  * unpartitioned; (b) cardinality — the partitioned window consumes the
  * per-minute domain and the global window the per-day domain, i.e.
  * both collapses actually happened.
  */
class WindowGuardSpec extends SparkSpec {

  test("events_lateness_histogram: two-level prefix max stays collapsed and day-bounded") {
    val df = SparkEntry.queries("events_lateness_histogram")(spark, sfDir)
    val analyzed = df.queryExecution.analyzed
    val windows = analyzed.collect { case w: LogicalWindow => w }
    assert(windows.size == 2, s"expected the two-level window pair:\n$analyzed")
    val (global, partitioned) = windows.partition(_.partitionSpec.isEmpty)
    assert(global.size == 1 && partitioned.size == 1,
      s"expected exactly one global and one partitioned window:\n$analyzed")
    // (a) Every window consumes an aggregate, never raw rows.
    for (win <- windows)
      assert(win.child.collect { case a: Aggregate => a }.nonEmpty,
        s"window must consume an aggregate, not raw rows:\n${win.child}")
    // (b) Partitioned (within-day) window input == the per-minute domain:
    // raw events feeding it would read orders of magnitude more rows.
    val minuteInput = Sessions.ofRows(spark, partitioned.head.child)
    val minuteRows = minuteInput.count()
    val minuteDomain =
      minuteInput.select(countDistinct(col("arr_min"))).head().getLong(0)
    assert(minuteRows == minuteDomain,
      s"within-day window input has $minuteRows rows but only $minuteDomain " +
        "distinct minutes — it is not the collapsed per-minute aggregate")
    // (c) Global window input == the per-day domain (the elapsed-time
    // bound) — and strictly coarser than the minute domain, so the
    // second collapse is real, not a re-labelled minute table.
    val dayInput = Sessions.ofRows(spark, global.head.child)
    val dayRows = dayInput.count()
    val dayDomain = dayInput.select(countDistinct(col("arr_day"))).head().getLong(0)
    assert(dayRows == dayDomain,
      s"global window input has $dayRows rows but only $dayDomain distinct " +
        "days — it is not the collapsed per-day aggregate")
    assert(dayRows < minuteRows,
      s"global window input ($dayRows) should be coarser than the minute " +
        s"domain ($minuteRows)")
    val rawEvents = graft.sources.Tables.events(spark, sfDir).count()
    assert(minuteRows <= rawEvents,
      s"window input ($minuteRows) exceeds the raw event count ($rawEvents)")
  }
}
