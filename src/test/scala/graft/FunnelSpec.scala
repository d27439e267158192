package graft

import graft.queries.ExtensionQueries

/** Pins the stage-anchoring semantics of the funnel cascade and the
  * multi-copy branch of the dedup group-size histogram on synthetic
  * frames — the fixture data cannot exercise either (every fixture user
  * saturates an unwindowed funnel; the fixture corpus has no exact
  * duplicates), so the DuckDB oracle gate alone would stay green under a
  * mis-anchored condition. These specs hold the line the oracle cannot.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val W = 100L // test conversion window, seconds

  private def funnel(rows: (Long, Long, String)*): (Long, Long, Long, Long) = {
    val df = rows.toSeq.toDF("user_id", "sec", "event_type")
    val r = ExtensionQueries.funnelOf(df, windowSec = W).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("full conversion in order counts at every stage") {
    assert(funnel((1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"))
      == ((1L, 1L, 1L, 1L)))
  }

  test("purchase BEFORE the click does not count as converted") {
    // click anchors at 20; the only purchase is at 15 < t2 — stage 3 empty
    assert(funnel((1L, 10L, "view"), (1L, 15L, "purchase"), (1L, 20L, "click"))
      == ((1L, 1L, 1L, 0L)))
  }

  test("click before the first view does not open stage 2") {
    assert(funnel((1L, 10L, "click"), (1L, 20L, "view"), (1L, 30L, "purchase"))
      == ((1L, 1L, 0L, 0L)))
  }

  test("click outside the conversion window is not a conversion") {
    assert(funnel((1L, 10L, "view"), (1L, 10L + W + 1L, "click"))
      == ((1L, 1L, 0L, 0L)))
  }

  test("purchase anchors on the WINDOWED click, not any click") {
    // First click at 15 is in-window and anchors t2=15; purchase at 140
    // is beyond t2+W even though it is within W of the LATER click at 50.
    // A cascade that anchored t3 on min(click) AFTER purchase-side
    // filtering, or on t1, would diverge here.
    assert(funnel((1L, 10L, "view"), (1L, 15L, "click"), (1L, 50L, "click"),
                  (1L, 140L, "purchase"))
      == ((1L, 1L, 1L, 0L)))
  }

  test("same-second step counts (>= anchoring) and users aggregate") {
    assert(funnel(
      (1L, 10L, "view"), (1L, 10L, "click"), (1L, 10L, "purchase"),
      (2L, 5L, "error"))
      == ((2L, 1L, 1L, 1L)))
  }

  test("group-size histogram counts multi-copy groups") {
    // 3 copies of A (one differing only by case/whitespace — normalized
    // equal), 2 of B, 1 of C -> histogram {1:1, 2:1, 3:1}
    val docs = Seq("alpha beta", "Alpha beta ", "alpha beta",
                   "gamma", "gamma", "delta").toDF("text")
    val hist = ExtensionQueries.groupSizesOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("retention counts only next-day actives, single-scan shape") {
    val ud = Seq((1L, 100L), (1L, 101L), (1L, 103L),
                 (2L, 100L), (2L, 102L),
                 (3L, 101L), (3L, 102L)).toDF("user_id", "day")
    val out = ExtensionQueries.retentionOf(ud).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // day 100: active {1,2}, only user 1 returns on 101 -> retained 1
    // day 101: active {1,3}, only user 3 returns on 102 -> retained 1
    // day 102: active {2,3}, neither is on 103 -> 0 (user 1 IS on 103
    // but was not active on 102 — retention must join per-user)
    // day 103: active {1}, nobody on 104 -> 0
    assert(out == Seq((100L, 2L, 1L), (101L, 2L, 1L), (102L, 2L, 0L), (103L, 1L, 0L)))
  }

  test("events_retention plans a SINGLE scan of the event log") {
    // The round-3 review found the self-join form instantiated the
    // distinct subplan three times (three full-log scans); the day-set
    // rewrite must keep it at one. sparkPlan, not executedPlan: AQE
    // wraps scans (DESIGN.md plan-assert note).
    val plan = queries.ExtensionQueries.eventsRetention(spark, sfDir)
      .queryExecution.sparkPlan
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 1, s"expected 1 events scan, got ${scans.length}")
  }

  test("events_funnel plans ONE data shuffle (user_id) before the 1-row agg") {
    // Exchanges are inserted by EnsureRequirements, so they only exist in
    // executedPlan; AQE off so that plan is the traversable static one
    // (same pattern as BucketedJoinSpec).
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = queries.ExtensionQueries.eventsFunnel(spark, sfDir)
        .queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.outputPartitioning
      }
      // one hash exchange on user_id + the SinglePartition collapse for
      // the global 1-row aggregate; anything more means the window
      // cascade or the per-user collapse stopped reusing the partitioning
      val hashExchanges = exchanges.count {
        case _: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning => true
        case _ => false
      }
      assert(hashExchanges == 1, s"expected 1 hash exchange, got $exchanges")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
