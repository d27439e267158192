package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.ColFns._

/** Extension operators beyond the reference surface (BASELINE.json north
  * star): exact dedup, text wordcount, embedding cosine top-k, event window
  * aggregates, and a star join with rollup. All are plain shuffle+agg/join
  * plans so they inherit Spark spill, codegen, and AQE at 100 TB.
  */
object ExtensionQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Exact dedup: group on an md5 digest of the normalized text, keep the
    * smallest doc_id as canonical (hpmr set-insert semantics made
    * deterministic). Grouping on the digest rather than the text keeps
    * shuffle rows at 32 bytes regardless of document size — the 100 TB
    * essential. The oracle groups on the normalized text itself; results
    * agree absent md5 collisions (2^-64 per corpus — acceptable and
    * standard for content-addressed dedup). */
  val dedupExact: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(normDigest(col("text")).as("norm"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  /** Duplicate-group size histogram over exact (normalized-text) dedup
    * groups: how many groups have 1 copy, 2 copies, … — the first chart
    * of any corpus-dedup report. Two cascaded aggregates, each with
    * map-side partials; the second groups on an already-tiny domain
    * (distinct sizes), so the heavy shuffle is the same 32-byte digest
    * rows as dedup_exact and the rest is noise. */
  val dedupExactGroupSizes: Q = (s, d) =>
    groupSizesOf(Tables.documents(s, d))

  /** Core of dedup_exact_group_sizes over any frame with a `text`
    * column. The fixtures contain no exact duplicates (every group has
    * size 1 there), so the multi-copy branch is pinned by a synthetic
    * duplicated frame in FunnelSpec rather than by the oracle gate. */
  def groupSizesOf(docs: DataFrame): DataFrame =
    docs
      .groupBy(normDigest(col("text")).as("norm"))
      .agg(count(lit(1)).as("sz"))
      .groupBy("sz")
      .agg(count(lit(1)).as("n_groups"))
      .orderBy("sz")

  /** The canonical MapReduce demo on real data: tokenize → explode →
    * count → top-k. Top-k is orderBy+limit — Spark plans TakeOrderedAndProject
    * (partial per-partition top-k, no global sort materialization). */
  val textWordcountTopk: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(words(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("word"))
      .limit(20)

  /** Brute-force cosine top-k over embeddings: quantized integer dot
    * products (exact, engine-portable) + per-probe window rank. The 100 TB
    * path is the LSH-bucketed variant in SimilarityOps; brute force is the
    * correctness baseline, with the probe side broadcast so candidates
    * never shuffle. */
  val simCosineTopk: Q = (s, d) => {
    // Norms are computed ONCE per vector (corpus side) and per probe
    // (broadcast side) — inlining qnorm2 in the scoring expression would
    // re-evaluate a 64-wide dot product per joined PAIR, 2×5N redundant
    // evaluations for N corpus rows.
    val q = Tables.embeddings(s, d)
      .select(col("vec_id"), quantizeVec(col("embedding")).as("qv"))
      .withColumn("n2", qnorm2(col("qv")))
    val probes = q.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("qv").as("pv"), col("n2").as("pn2"))
    val scored = q.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        (qdot(col("pv"), col("qv")) /
          (sqrt(col("pn2")) * sqrt(col("n2")))).as("cos"))
    val w = Window.partitionBy("probe_id").orderBy(desc("cos"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("cand_id"), round(col("cos"), 6).as("score"))
      .orderBy("probe_id", "cand_id")
  }

  /** Tumbling-window aggregate over the event stream (batch form; the
    * streaming form with watermarks lives in graft.streaming). Pure integer
    * hour bucketing on the long-nanos ts — deterministic in both engines. */
  /** Rolling window FRAME analytics (ROWS BETWEEN 4 PRECEDING AND CURRENT
    * ROW): per-user rolling sum/count/max over the last 5 events in
    * event-time order. Exercises bounded row frames — the one window shape
    * the rest of the inventory doesn't (running totals use unbounded
    * frames, ranks use no frame). The frame sum goes through DECIMAL so
    * the result is order-exact; (sec, event_id) is a unique total order so
    * both engines build identical frames. One shuffle on user_id; frames
    * evaluate within partitions. */
  val eventsRollingStats: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("event_id"), col("user_id"),
      nsToEpochSec(col("ts")).as("sec"), col("value"))
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    e.select(col("user_id"), col("event_id"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .over(w).cast("double").as("roll_sum"),
        count(lit(1)).over(w).as("roll_n"),
        max(col("value")).over(w).as("roll_max"))
      .orderBy("user_id", "event_id")
  }

  /** Date arithmetic over a fact-fact join: distribution of days between
    * order placement and line shipment. Exercises the DATE scalar family
    * (to_date truncation + day difference) — the one scalar class the
    * rest of the inventory doesn't — with an integer-days result so both
    * engines agree exactly (UTC session; DuckDB DATE−DATE is BIGINT days,
    * Spark datediff is INT, cast to match). The join shuffles on
    * orderkey at scale (broadcast at test SF); the histogram output is
    * tiny. */
  val ordersShipDelay: Q = (s, d) =>
    Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
        .cast("long").as("delay_days"))
      .groupBy("delay_days").agg(count(lit(1)).as("n"))
      .orderBy("delay_days")

  /** PIVOT: daily event counts reshaped to one column per event type —
    * the relational reshaping op the rest of the inventory doesn't
    * exercise. The pivot value list is EXPLICIT (Spark would otherwise
    * collect distinct values in an extra job, and the column order would
    * be data-dependent); counts coalesce to 0 so the result matches the
    * oracle's conditional aggregates (Spark pivot yields null for empty
    * cells). Plan is a plain two-phase hash aggregate on day — pivot is
    * sugar over conditional aggregation, nothing new shuffles. */
  val eventsPivotDaily: Q = (s, d) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val daily = Tables.events(s, d)
      .select(floorDiv(col("ts"), 86400L * 1000000000L).as("day"),
              col("event_type"))
      .groupBy("day").pivot("event_type", types).count()
    daily.select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("day")
  }

  val eventsTumblingAgg: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(nsToHourEpoch(col("ts")).as("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           decSum2(col("value")).as("sum_value"),
           min(col("value")).as("min_value"),
           max(col("value")).as("max_value"))
      .orderBy("hour_epoch", "event_type")

  /** Per-user event profile: count, distinct types, first/last seen, exact
    * value sum — the per-key "stats" shape of a sessionization pipeline. */
  val eventsSessionlessStats: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("event_type")).as("n_types"),
           min(nsToEpochSec(col("ts"))).as("first_sec"),
           max(nsToEpochSec(col("ts"))).as("last_sec"),
           decSum2(col("value")).as("sum_value"))
      .orderBy("user_id")

  /** Star join + ROLLUP grouped aggregate — exercises the join family the
    * reference lacks (SURVEY §2.2). nation is broadcast explicitly;
    * orders⋈customer and lineitem⋈orders shuffle on their keys (AQE may
    * still elect broadcast at small SF). Revenue accumulates exactly in
    * DECIMAL(18,4). */
  val joinStarRollup: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    val nat = broadcast(Tables.nation(s, d))
    // ROLLUP computed as re-aggregation from the finest level instead of
    // Catalyst's Expand (round-18 optimization): Expand multiplies every
    // joined row ×3 BEFORE the partial aggregate, tripling the decimal
    // accumulator work in the corpus-scale stage (measured: the 1.6 s
    // single-task scan+join+agg stage was this query's whole wall). The
    // super-aggregate levels re-aggregate the ≤ |nations×segments|-row
    // base IN DECIMAL (exact sums of exact sums — the double cast
    // happens once at the end, so every value is bit-identical to the
    // Expand form's), with the rollup's NULL markers as literal nulls —
    // identical output because both grouping columns are null-free by
    // the fixture schema (the oracle's ROLLUP agrees row-for-row).
    // At 100 TB this is strictly less partial-agg work and an
    // unchanged shuffle row count; olap_grouping_sets keeps the
    // Expand/grouping-sets plan class demonstrated.
    val dec = org.apache.spark.sql.types.DecimalType(18, 4)
    val base = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec))
             .as("rev"),
           count(lit(1)).as("n_rows"))
    // coalesce(sum(n_rows), 0): on an EMPTY join input the true ROLLUP
    // still emits its grand-total row with n_rows = 0 (a COUNT), while a
    // bare re-aggregated SUM would read null — unreachable on this
    // fixture (the 3-way join is never empty) but the re-aggregation
    // pattern must not silently diverge if reused (ADVICE r18). rev
    // stays a bare SUM: the rollup's own grand-total rev over zero rows
    // IS null.
    val lvl1 = base.groupBy(col("n_name"))
      .agg(sum(col("rev")).as("rev"),
        coalesce(sum(col("n_rows")), lit(0L)).as("n_rows"))
      .select(col("n_name"), lit(null).cast("string").as("c_mktsegment"),
        col("rev"), col("n_rows"))
    val lvl2 = base
      .agg(sum(col("rev")).as("rev"),
        coalesce(sum(col("n_rows")), lit(0L)).as("n_rows"))
      .select(lit(null).cast("string").as("n_name"),
        lit(null).cast("string").as("c_mktsegment"), col("rev"), col("n_rows"))
    base.select(col("n_name"), col("c_mktsegment"), col("rev"), col("n_rows"))
      .unionByName(lvl1).unionByName(lvl2)
      .select(col("n_name"), col("c_mktsegment"),
        col("rev").cast("double").as("revenue"), col("n_rows"))
      .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))
  }

  /** Batch sessionization via window functions: a new session starts after
    * a >30 min gap; session count = sum of session-start flags per user.
    * Ordering and gaps use integer epoch seconds with event_id tiebreak so
    * both engines see the identical sequence (raw nanos vs the oracle's
    * µs-truncated timestamps could disagree within a microsecond of a
    * boundary). The window shuffles once on user_id — the same state
    * keying the streaming sessionizer uses. */
  val eventsSessionized: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), nsToEpochSec(col("ts")).as("sec"))
      .withColumn("new_session",
        when(col("sec") - lag(col("sec"), 1).over(w) > 1800L || lag(col("sec"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Exact per-type percentiles (p50/p90/p99) of the value column —
    * interpolated rank statistics over identical sorted doubles are
    * bit-identical across engines. Scale note: exact `percentile` buffers
    * every group value, so per-group state is unbounded — at 100 TB the
    * mergeable bounded-state sketch (`percentile_approx`, contract-gated
    * in [[approxStats]]) is the production path; this exact form is the
    * oracle-able baseline. */
  val eventsPercentiles: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        call_function("percentile", col("value"), lit(0.5)).as("p50"),
        call_function("percentile", col("value"), lit(0.9)).as("p90"),
        call_function("percentile", col("value"), lit(0.99)).as("p99"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Watermark-lateness histogram — the diagnostic that sizes a streaming
    * job's watermark delay: for each event, lateness = how far its event
    * time lags the GLOBAL event-time high-water mark at arrival — global
    * because Spark's streaming watermark is global (a per-user lateness
    * would under-size the watermark whenever one user's stream trails
    * another's; StreamingSpec cross-validates the rule against actual
    * watermark drops). The histogram's tail quantile is the watermark
    * delay to configure. Scale shape: the global running max is NEVER a
    * raw-event window — arrivals aggregate to per-minute maxima first,
    * and the prefix max over minutes is TWO-LEVEL (round-9 verdict watch
    * item #1): a per-DAY-partitioned window computes the within-day
    * prefix, a second prefix max over the per-day maxima (one row per
    * calendar day — bounded by elapsed time, not data volume; a global
    * window only in the formal sense) carries earlier days forward, and
    * `greatest` of the two (null-skipping) reassembles the exact global
    * prefix — max is associative, so the decomposition is bit-identical
    * to the single running max, while the largest window partition is
    * now ≤ 1440 minute rows whatever the ingest history. Then the
    * per-minute HWM equi-joins back to arrivals (the day table rides the
    * same join broadcast-small). WindowGuardSpec pins both collapse
    * levels. The fixture's event_id order is perfectly time-sorted, so
    * arrival is simulated as sec + md5-derived jitter (same device as the
    * hash-based sampling queries); the 1 h jitter bound caps observable
    * lateness at 12 buckets — a simulation artifact, gone with a real
    * arrival column. */
  val eventsLatenessHistogram: Q = (s, d) => {
    // The simulated-arrival frame snapshots (round-18): it feeds the
    // bucket aggregate AND the final lateness join, and un-snapshotted
    // lineage re-ran the scan + per-event md5 once per reader (two
    // full single-task passes in StageProfile). Cached rows are two
    // longs per event — far narrower than the recompute.
    val arr = org.apache.spark.sql.graftx.Sessions.snapshot(
      Tables.events(s, d)
        .select(col("event_id"), nsToEpochSec(col("ts")).as("sec"))
        .withColumn("arr",
          col("sec") + md5Long(col("event_id").cast("string")) % 3600L)
        .withColumn("arr_min", floorDiv(col("arr"), 60L))
        .select(col("sec"), col("arr_min")))._2
    val buckets = arr.groupBy("arr_min").agg(max(col("sec")).as("max_sec"))
      .withColumn("arr_day", floorDiv(col("arr_min"), 1440L))
    val wDay = Window.partitionBy("arr_day").orderBy("arr_min")
      .rowsBetween(Window.unboundedPreceding, -1)
    val inDay = buckets.withColumn("in_day_before", max(col("max_sec")).over(wDay))
    val wDays = Window.orderBy("arr_day").rowsBetween(Window.unboundedPreceding, -1)
    val dayPrefix = buckets.groupBy("arr_day").agg(max(col("max_sec")).as("day_max"))
      .withColumn("day_hwm_before", max(col("day_max")).over(wDays))
      .select(col("arr_day"), col("day_hwm_before"))
    // greatest skips nulls: null only when BOTH levels are empty, i.e.
    // the first minute of the first day — exactly the single-window
    // semantics the filter below expects.
    val prefix = inDay.join(broadcast(dayPrefix), "arr_day")
      .select(col("arr_min"),
        greatest(col("in_day_before"), col("day_hwm_before")).as("hwm_before"))
    arr.join(prefix, "arr_min")
      .filter(col("hwm_before").isNotNull)
      .select(call_function("div",
        greatest(col("hwm_before") - col("sec"), lit(0L)), lit(300L)).as("late_bucket"))
      .groupBy("late_bucket").agg(count(lit(1)).as("n_events"))
      .orderBy("late_bucket")
  }

  /** Relational set algebra (union/intersect/except counts) over two
    * customer key sets, as one full-outer join + conditional aggregate —
    * the set-container semantics of the reference (SURVEY §2.2 set ops)
    * expressed without materializing three separate plans. */
  val setOpsCounts: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val a = cust.filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey").as("k")).distinct().withColumn("in_a", lit(1))
    val b = cust.filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey").as("k")).distinct().withColumn("in_b", lit(1))
    a.join(b, Seq("k"), "full_outer")
      .agg(count(lit(1)).as("n_union"),
           sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L).otherwise(0L)).as("n_intersect"),
           sum(when(col("in_a").isNotNull && col("in_b").isNull, 1L).otherwise(0L)).as("n_except"))
  }

  /** JSON extraction over the props column: parse `{"k": <int>}`, bucket
    * by k decile, aggregate. get_json_object is codegen'd path extraction —
    * no UDF, no whole-document parse per field at scale. */
  val eventsPropsJson: Q = (s, d) =>
    Tables.events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
              col("value"))
      .filter(col("k").isNotNull)
      .groupBy(floorDiv(col("k"), 10L).as("k_decile"))
      .agg(count(lit(1)).as("n"), decSum2(col("value")).as("sum_value"))
      .orderBy("k_decile")

  /** Calendar aggregation on the timestamp_ntz order date: monthly order
    * counts and exact revenue — the date-function row of the SURVEY §2.2
    * checklist. The month is output as a formatted string, not an epoch:
    * formatting an NTZ value is timezone-free in both engines, whereas
    * unix_timestamp would shift with the session timezone and silently
    * break oracle parity on a non-UTC session. */
  val ordersMonthly: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
           decSum2(col("o_totalprice")).as("revenue"))
      .orderBy("month")

  /** CUBE grouping sets over (event_type, day): all four aggregation
    * granularities in one pass (Expand → single shuffle), completing the
    * grouping-sets family next to the star ROLLUP. */
  val eventsTypeDayCube: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
              floorDiv(nsToEpochSec(col("ts")), 86400L).as("day"),
              col("value"))
      .cube(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), decSum2(col("value")).as("sum_value"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("day"))

  /** Explicit GROUPING SETS — the ASYMMETRIC set algebra neither CUBE
    * ([[eventsTypeDayCube]]: all 2ⁿ sets) nor ROLLUP ([[joinStarRollup]]:
    * the prefix chain) expresses: ((source, lang), (source), ()) reports
    * per-source-per-language detail, per-source subtotals, and the grand
    * total WITHOUT the (lang)-only set a cube would force — the report
    * shape real curation dashboards ask for. `grouping_id()` (the
    * standard SQL bit vector, identical in Spark and DuckDB's
    * GROUPING(a, b)) disambiguates aggregated-away NULLs from data
    * NULLs, so the output is self-describing.
    *
    * Scale shape: Catalyst plans one Expand (×|sets| = 3, a constant)
    * feeding ONE partial+final hash aggregate — the multi-set report
    * costs one corpus scan and one shuffle of the expanded-but-collapsed
    * group cells, never |sets| separate scans unioned (what a naive
    * report pipeline runs). */
  val olapGroupingSets: Q = (s, d) =>
    Tables.documents(s, d)
      .groupingSets(
        Seq(Seq(col("source"), col("lang")), Seq(col("source")), Seq()),
        col("source"), col("lang"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("sum_chars"))
      .select(col("source"), col("lang"), col("gid"),
              col("n_docs"), col("sum_chars"))
      .orderBy(asc("gid"), asc_nulls_first("source"), asc_nulls_first("lang"))

  /** Approximate aggregates — the 100 TB escape hatches when exact
    * distinct counts / percentiles get too expensive: HyperLogLog++ and
    * t-digest-style quantile sketches, both mergeable across partitions.
    * Sketch internals differ by engine, so raw sketch values cannot be
    * oracle-compared; instead the query emits the exactly-checkable
    * columns (`n`, `exact_parts`) plus `approx_ok` — whether BOTH sketch
    * results land within 5% of the exact values computed in the same plan.
    * The oracle asserts `approx_ok = TRUE`, so a sketch whose error drifts
    * past the contract turns the driver gate red (round-1 gap #5: this
    * query had no checkable entry at all). ApproxStatsSpec additionally
    * bounds the numeric errors. */
  val approxStats: Q = (s, d) => {
    val base = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_partkey"), col("l_extendedprice"))
    // countDistinct mixed into the same agg as the percentiles makes
    // Catalyst plan an Expand (row multiplication per distinct path) under
    // the exact-percentile buffer — measured 7.3 s at sf0.1. Instead the
    // exact distinct count runs as explicit two-phase aggregation (pairs,
    // then count) — the shape that scales anyway — and joins back on the
    // 3-row group key.
    val sketches = base.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
           percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median"),
           // non-null price count — the percentile semantics count only
           // non-null inputs; equals n on this fixture but the formula
           // must not silently assume it
           count(col("l_extendedprice")).as("nn_price"))
    // Exact median via a sort-based window pick instead of the generic
    // `percentile` aggregate (round-19 measurement: the Percentile
    // buffer — a boxed OpenHashMap holding ~200k near-distinct prices
    // per group — cost ~2.5 of this query's 3.4 executor-CPU-s across
    // its partial/merge/final stages; StageProfile stages 39/41 burned
    // 1.0 CPU-s each on THREE shuffled rows). The window form sorts
    // primitive doubles under whole-stage codegen and keeps the exact
    // value: row_number over price order picks the two middle rows, and
    // the interpolation below is the Percentile formula verbatim
    // (lower + (higher − lower) · (pos − ⌊pos⌋) with pos = (n−1)·0.5 in
    // double arithmetic) — ApproxStatsSpec pins bit-equality against
    // the percentile() aggregate on fixture and synthetic odd/even/
    // duplicate-heavy groups. At scale both shapes gather every value
    // of a group (the exact-median contract); the sort-based one spills
    // gracefully where the hash-map buffer OOMs. The emitted columns
    // are unchanged (exact_median itself never leaves the plan — it
    // feeds the approx_ok comparison).
    // The group count n rides in from `sketches` over a 3-row broadcast
    // (AQE reuses the aggregate's exchange) instead of a second
    // whole-partition count window — one 600k-row window pass, not two.
    val wOrd = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    val pos = (col("cnt") - 1L).cast("double") * lit(0.5)
    val mid = base
      .filter(col("l_extendedprice").isNotNull)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("r", row_number().over(wOrd))
      .join(broadcast(sketches.select(col("l_returnflag").as("c_flag"),
        col("nn_price").as("cnt"))), col("l_returnflag") === col("c_flag"))
      .filter(col("r") === floor(pos).cast("long") + 1L ||
              col("r") === ceil(pos).cast("long") + 1L)
      .groupBy("l_returnflag")
      .agg(min(col("l_extendedprice")).as("m_lower"),
           max(col("l_extendedprice")).as("m_higher"),
           min(pos - floor(pos)).as("m_frac"))
      .select(col("l_returnflag").as("m_flag"),
        (col("m_lower") + (col("m_higher") - col("m_lower")) * col("m_frac"))
          .as("exact_median"))
    // Snapshot the 3-row median table: StageProfile showed the window
    // branch otherwise executing twice (once to build the broadcast,
    // once re-planned under AQE) — the snapshot pins ONE 600k-row
    // window pass and the joins read the cached rows.
    val midSnap = org.apache.spark.sql.graftx.Sessions.snapshot(mid)._2
    val exact = base.select("l_returnflag", "l_partkey").distinct()
      .groupBy("l_returnflag").agg(count(lit(1)).as("exact_parts"))
    sketches.join(midSnap, col("l_returnflag") === col("m_flag"))
      .join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <= col("exact_parts") * 0.05 &&
         abs(col("approx_median") - col("exact_median")) <= abs(col("exact_median")) * 0.05)
          .as("approx_ok"))
      .orderBy("l_returnflag")
  }

  /** Heavy hitters with a Count-Min Sketch contract — the frequency
    * member of the sketch family (HLL distinct in [[approxStats]], Bloom
    * membership in [[bloomMembership]], quantile sketch in
    * [[approxStats]]). The driver-checkable part is the exact top-10
    * word list (two-phase agg + TakeOrdered); the sketch part asserts
    * the CMS point-estimate contract per hitter: est ≥ true (certain —
    * CMS never undercounts) and est ≤ true + ⌈ε·N⌉ (the accuracy bound).
    * CMS is a LINEAR sketch — per-partition sketches add elementwise —
    * so the merged estimate is identical under any partitioning and the
    * booleans are deterministic. The probe UDF deserializes the sketch
    * only over the 10 result rows (never per input row); at 100 TB the
    * sketch replaces the exact aggregate when only the hitters are
    * needed, e.g. hot-key detection feeding [[graft.operators.Skew]]. */
  val heavyHittersCms: Q = (s, d) => {
    val wordsAll = Tables.documents(s, d)
      .select(explode(words(col("text"))).as("word"))
    val top = wordsAll.groupBy("word").agg(count(lit(1)).as("n_true"))
      .orderBy(desc("n_true"), asc("word")).limit(10)
    val sk = wordsAll.agg(
      count_min_sketch(col("word"), lit(0.001d), lit(0.99d), lit(42)).as("sk"),
      count(lit(1)).as("n_total"))
    val est = udf { (bytes: Array[Byte], w: String) =>
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bytes)).estimateCount(w)
    }
    top.crossJoin(broadcast(sk))
      .withColumn("cms_est", est(col("sk"), col("word")))
      .select(col("word"), col("n_true"),
        (col("cms_est") >= col("n_true") &&
          col("cms_est") <= col("n_true") + ceil(col("n_total") * 0.001d))
          .as("cms_ok"))
      .orderBy("word")
  }

  /** As-of join: each event picks up the most recent prior order total of
    * the same customer (graft.operators.AsOf — union + running-last
    * window, one shuffle on the key). The quote side pre-aggregates to a
    * unique (custkey, date) so tie resolution is well defined; the oracle
    * is DuckDB's native ASOF LEFT JOIN. */
  val asofLastOrder: Q = (s, d) => {
    import graft.operators.AsOf
    val ord = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("k"),
               unix_timestamp(col("o_orderdate")).as("t"))
      .agg(max_by(col("o_totalprice"), col("o_orderkey")).as("last_price"))
    val ev = Tables.events(s, d)
      .select(col("user_id").as("k"), nsToEpochSec(col("ts")).as("t"),
              col("event_id"))
    AsOf.asofJoin(ev, ord, "k", "t", "last_price")
      .select(col("event_id"), col("k").as("user_id"), col("last_price"))
      .orderBy("event_id")
  }

  /** Range join: every event falling inside a 45-minute "incident window"
    * opened at the first error of each hour, counted per window
    * (graft.operators.RangeJoin — binned equi-join, not a nested loop;
    * windows deliberately cross bin boundaries). Oracle: DuckDB's native
    * inequality join. */
  val eventsErrorWindowJoin: Q = (s, d) => {
    import graft.operators.RangeJoin
    val ev = Tables.events(s, d)
      .select(nsToEpochSec(col("ts")).as("sec"), col("event_type"))
    val windows = ev.filter(col("event_type") === "error")
      .groupBy((floorDiv(col("sec"), 3600L) * 3600L).as("hr"))
      .agg(min(col("sec")).as("win_start"))
      .select(col("win_start"), (col("win_start") + 2700L).as("win_end"))
    RangeJoin.rangeJoin(ev.select("sec"), "sec", windows, "win_start", "win_end", 1800L)
      .groupBy("win_start")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("win_start")
  }

  /** Native gap-based session windows (session_window, the engine
    * primitive behind streaming sessionization) — per-user sessions with
    * a 30-minute gap, reported as (user, session_start, n_events, exact
    * value sum). The oracle reproduces the semantics with lag/cumsum over
    * integer seconds; a session closes when the next event is >= gap away
    * (session windows are end-exclusive). */
  val eventsSessionWindows: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("user_id"),
              timestamp_micros(floorDiv(col("ts"), 1000L)).as("tts"),
              col("value"))
      .groupBy(col("user_id"), session_window(col("tts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), decSum2(col("value")).as("sum_value"))
      .select(col("user_id"),
              unix_timestamp(col("sw.start")).as("session_start"),
              col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** Approximate membership: a bloom filter of the BUILDING-segment
    * customer keys probes every order, map-side — the 100 TB form of
    * hpmr's `has()` (graft.functions.Bloom): at scale you bloom-filter
    * the fact scan instead of shuffling it into a semi join, the same
    * plan shape Spark's InjectRuntimeFilter builds internally. The bloom
    * bits aren't portable to an oracle, so (approx_stats precedent) the
    * query emits the exactly-checkable member count plus two contract
    * booleans: `no_false_negatives` (a bloom MUST hit every true member
    * — a single miss is a correctness bug, not noise) and `fp_ok`
    * (false-positive rate over non-members within 5%; capacity 1M keys
    * is sized for ~3% FPP at full load, far lower here). The left join
    * against the key set exists only to compute the exact truth the
    * booleans are judged against. */
  val bloomMembership: Q = (s, d) => {
    import graft.functions.Bloom
    val bld = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val bloomDf = bld.agg(Bloom.bloomAgg(col("c_custkey"), 1000000L).as("bf"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .withColumn("bloom_hit", Bloom.mightContain(bloomDf, col("o_custkey")))
      .join(bld.select(col("c_custkey").as("m_key")),
        col("o_custkey") === col("m_key"), "left_outer")
      .withColumn("is_member", col("m_key").isNotNull)
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("is_member"), 1L).otherwise(0L)).as("n_member_orders"),
        (sum(when(col("is_member") && !col("bloom_hit"), 1L).otherwise(0L)) === 0L)
          .as("no_false_negatives"),
        (sum(when(!col("is_member") && col("bloom_hit"), 1L).otherwise(0L)) <=
          sum(when(!col("is_member"), 1L).otherwise(0L)) * 0.05).as("fp_ok"))
  }

  /** Fixed-width numeric binning — the OLAP histogram primitive as one
    * map-side bucket expression + grouped aggregate (no shuffle beyond
    * the bucket key; ~30 buckets regardless of scale). floor of one IEEE
    * division is bit-identical in both engines; the price sum goes
    * through exact DECIMAL accumulation per the determinism doctrine. */
  val ordersPriceHistogram: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 25000d).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), decSum2(col("o_totalprice")).as("sum_price"))
      .orderBy("bucket")

  /** Sequence analytics: per-user event-type TRANSITION counts (the
    * Markov matrix behind funnel/behavior models) — lag over the
    * per-user event-time order, then a global (prev, next) aggregate.
    * One shuffle on user_id for the window (same partitioning every
    * per-user operator here reuses), then a tiny 25-cell aggregate.
    * Ordering ties broken by event_id so both engines see one sequence. */
  val eventsTypeTransitions: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), nsToEpochSec(col("ts")).as("sec"),
              col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "event_type")
  }

  /** Ordered conversion funnel view → click → purchase with a 24 h
    * conversion window per step: per user, the earliest view, the
    * earliest click within [t1, t1+24h], the earliest purchase within
    * [t2, t2+24h] (second granularity, >= so same-second steps count —
    * ordering inside one second is not meaningful at event scale; the
    * window keeps the stages selective, which also means the oracle gate
    * actually exercises the cascade anchoring — without it every fixture
    * user saturates all stages and a mis-anchored condition would pass).
    * Three stacked unbounded windows over the SAME user_id partitioning
    * — Catalyst plans one exchange and evaluates the cascade in one pass
    * per user, the per-user-sequence shape every funnel/attribution job
    * needs; the per-user collapse that follows reuses that partitioning,
    * so the whole funnel costs a single shuffle of (user_id, sec, type)
    * triples. */
  val eventsFunnel: Q = (s, d) =>
    funnelOf(Tables.events(s, d)
      .select(col("user_id"), nsToEpochSec(col("ts")).as("sec"), col("event_type")))

  /** Core of events_funnel over any (user_id, sec, event_type) frame;
    * FunnelSpec drives the stage-anchoring edge cases (purchase before
    * click, click outside the window, …) through this directly. */
  def funnelOf(events: DataFrame, windowSec: Long = 86400L): DataFrame = {
    val wU = Window.partitionBy("user_id")
    events
      .withColumn("t1",
        min(when(col("event_type") === "view", col("sec"))).over(wU))
      .withColumn("t2",
        min(when(col("event_type") === "click"
          && col("sec") >= col("t1") && col("sec") <= col("t1") + windowSec,
          col("sec"))).over(wU))
      .withColumn("t3",
        min(when(col("event_type") === "purchase"
          && col("sec") >= col("t2") && col("sec") <= col("t2") + windowSec,
          col("sec"))).over(wU))
      .groupBy("user_id")
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
      .agg(count(lit(1)).as("n_users"),
           sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("n_viewed"),
           sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("n_clicked"),
           sum(when(col("t3").isNotNull, 1L).otherwise(0L)).as("n_purchased"))
  }

  /** Cohort retention: per UTC day, how many distinct active users were
    * also active the following day — the training-data freshness /
    * engagement primitive. See [[retentionOf]] for the single-scan
    * shape. */
  val eventsRetention: Q = (s, d) =>
    retentionOf(Tables.events(s, d)
      .select(col("user_id"),
              floorDiv(nsToEpochSec(col("ts")), 86400L).as("day")))

  /** Core of events_retention over any (user_id, day) frame. Single scan
    * of the log: distinct pairs, then each user's day set is collected
    * once (bounded — at most one element per calendar day, a few hundred
    * longs even over years) and every day looks up day+1 in its own
    * user's array. The earlier self-join formulation planned THREE
    * full-log scan+distinct pipelines (the distinct subplan is
    * instantiated per branch and exchange reuse cannot merge the
    * differently-filtered copies); this shape scans once and shuffles
    * only the already-collapsed pairs. */
  def retentionOf(userDays: DataFrame): DataFrame =
    userDays.distinct()
      .groupBy("user_id").agg(collect_set(col("day")).as("ds"))
      .select(explode(col("ds")).as("day"),
              array_contains(col("ds"), col("day") + 1L).as("ret"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
           sum(when(col("ret"), 1L).otherwise(0L)).as("n_retained"))
      .orderBy("day")

  /** Robust daily-volume anomaly flags per event type — median/MAD, the
    * outlier-resistant rule ops dashboards use where mean/stddev would
    * let the anomaly inflate its own baseline. Every (type, day) bucket
    * is emitted with its count, the per-type median and MAD, and the
    * flag |n − median| > 3·MAD; the 3·MAD cut is the textbook constant,
    * not fixture tuning, and a zero MAD (≥ half the days sit exactly on
    * the median) degenerates to flagging any deviation — the standard
    * behavior, documented rather than patched. Everything is exact:
    * counts are integers, medians/MADs of integers are half-integers
    * (binary-exact doubles), so the compare is bit-identical in both
    * engines and no rounding ambiguity can flip a flag.
    *
    * Scale shape: ONE corpus-scale shuffle (the map-side-combined
    * (type, day) count); both median passes and the joins run over the
    * collapsed per-type-day table — |types| × operational days, bounded
    * by the calendar, not the event volume. The two-pass median (median
    * of n, then median of |n − med|) re-reads that tiny table, never
    * the log. */
  val eventsAnomalyMad: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .select(col("event_type"),
              floorDiv(nsToEpochSec(col("ts")), 86400L).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val snap = org.apache.spark.sql.graftx.Sessions.snapshot(daily)._2
    val med = snap.groupBy("event_type")
      .agg(median(col("n")).as("med"))
    val dev = snap.join(med, "event_type")
      .withColumn("adev", abs(col("n").cast("double") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(median(col("adev")).as("mad"))
    dev.join(mad, "event_type")
      .select(col("event_type"), col("day"), col("n"),
        col("med").as("day_median"), col("mad").as("day_mad"),
        when(col("adev") > lit(3.0) * col("mad"), 1L).otherwise(0L)
          .as("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** Daily active users with the new-vs-returning split — the growth
    * dashboard primitive next to [[eventsRetention]]. Single scan like
    * retention (the naive form joins the log against a min-day subquery,
    * scanning it twice): distinct (user, day) pairs once, then each
    * user's first day comes from a min window over the SAME user_id
    * partitioning, and the final aggregate shuffles only the collapsed
    * pairs on day. At 100 TB the distinct is the big shuffle; everything
    * after moves one row per user-day. */
  val eventsDailyActive: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
    Tables.events(s, d)
      .select(col("user_id"),
              floorDiv(nsToEpochSec(col("ts")), 86400L).as("day"))
      .distinct()
      .withColumn("first_day", min(col("day")).over(w))
      .groupBy("day")
      .agg(count(lit(1)).as("dau"),
           sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("n_new"))
      .orderBy("day")
  }

  val queries: Map[String, Q] = Map(
    "events_anomaly_mad" -> eventsAnomalyMad,
    "events_daily_active" -> eventsDailyActive,
    "events_type_transitions" -> eventsTypeTransitions,
    "events_retention" -> eventsRetention,
    "orders_price_histogram" -> ordersPriceHistogram,
    "bloom_membership" -> bloomMembership,
    "events_session_windows" -> eventsSessionWindows,
    "events_error_window_join" -> eventsErrorWindowJoin,
    "asof_last_order" -> asofLastOrder,
    "approx_stats" -> approxStats,
    "heavy_hitters_cms" -> heavyHittersCms,
    "events_type_day_cube" -> eventsTypeDayCube,
    "olap_grouping_sets" -> olapGroupingSets,
    "events_props_json" -> eventsPropsJson,
    "orders_monthly" -> ordersMonthly,
    "events_sessionized" -> eventsSessionized,
    "events_percentiles" -> eventsPercentiles,
    "events_lateness_histogram" -> eventsLatenessHistogram,
    "set_ops_counts" -> setOpsCounts,
    "dedup_exact" -> dedupExact,
    "dedup_exact_group_sizes" -> dedupExactGroupSizes,
    "events_funnel" -> eventsFunnel,
    "text_wordcount_topk" -> textWordcountTopk,
    "sim_cosine_topk" -> simCosineTopk,
    "events_tumbling_agg" -> eventsTumblingAgg,
    "events_rolling_stats" -> eventsRollingStats,
    "orders_ship_delay" -> ordersShipDelay,
    "events_pivot_daily" -> eventsPivotDaily,
    "events_sessionless_stats" -> eventsSessionlessStats,
    "join_star_rollup" -> joinStarRollup,
  )

  val oracles: Map[String, String] = Map(
    "events_anomaly_mad" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), med AS (
        |  SELECT event_type, median(n) AS med FROM daily GROUP BY event_type
        |), dev AS (
        |  SELECT d.event_type, d.day, d.n, m.med,
        |         abs(CAST(d.n AS DOUBLE) - m.med) AS adev
        |  FROM daily d JOIN med m USING (event_type)
        |), mad AS (
        |  SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
        |)
        |SELECT v.event_type, v.day, v.n, v.med AS day_median, a.mad AS day_mad,
        |       CAST(CASE WHEN v.adev > 3.0 * a.mad THEN 1 ELSE 0 END AS BIGINT)
        |         AS is_anomaly
        |FROM dev v JOIN mad a USING (event_type)
        |ORDER BY v.event_type, v.day""".stripMargin,
    "events_type_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        |  FROM events
        |), seq AS (
        |  SELECT event_type,
        |         LAG(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev_type
        |  FROM e
        |)
        |SELECT prev_type, event_type, COUNT(*) AS n
        |FROM seq WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type
        |ORDER BY prev_type, event_type""".stripMargin,
    "events_daily_active" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day
        |  FROM events
        |), f AS (
        |  SELECT day, MIN(day) OVER (PARTITION BY user_id) AS first_day FROM days
        |)
        |SELECT day, COUNT(*) AS dau,
        |       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        |FROM f GROUP BY day ORDER BY day""".stripMargin,
    "events_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day
        |  FROM events
        |), active AS (
        |  SELECT day, COUNT(*) AS n_active FROM days GROUP BY day
        |), retained AS (
        |  SELECT a.day, COUNT(*) AS n_retained
        |  FROM days a JOIN days b ON b.user_id = a.user_id AND b.day = a.day + 1
        |  GROUP BY a.day
        |)
        |SELECT day, n_active,
        |       CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained
        |FROM active LEFT JOIN retained USING (day)
        |ORDER BY day""".stripMargin,
    "orders_price_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,
    // Bloom bits are engine-internal; the oracle checks the exact member
    // count and asserts both contract booleans TRUE (approx_stats
    // precedent — a false negative or excess FP rate turns the gate red).
    "bloom_membership" ->
      """SELECT COUNT(*) AS n_orders,
        |       CAST(SUM(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_member_orders,
        |       TRUE AS no_false_negatives,
        |       TRUE AS fp_ok
        |FROM orders o
        |LEFT JOIN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') c
        |  ON o.o_custkey = c.c_custkey""".stripMargin,
    "events_session_windows" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
        |         epoch_us(ts) AS us
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, value, us,
        |         CASE WHEN us - LAG(us) OVER w >= 1800000000
        |                OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), sessions AS (
        |  SELECT user_id, value, us,
        |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, MIN(us) // 1000000 AS session_start,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "events_error_window_join" ->
      """WITH ev AS (
        |  SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
        |         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hr, event_type
        |  FROM events
        |), w AS (
        |  SELECT MIN(sec) AS win_start, MIN(sec) + 2700 AS win_end
        |  FROM ev WHERE event_type = 'error'
        |  GROUP BY hr
        |)
        |SELECT win_start, COUNT(*) AS n_events
        |FROM w JOIN ev ON ev.sec >= w.win_start AND ev.sec < w.win_end
        |GROUP BY win_start ORDER BY win_start""".stripMargin,
    "asof_last_order" ->
      """WITH ord AS (
        |  SELECT o_custkey AS k, CAST(epoch(o_orderdate) AS BIGINT) AS t,
        |         max_by(o_totalprice, o_orderkey) AS last_price
        |  FROM orders GROUP BY 1, 2
        |), ev AS (
        |  SELECT user_id AS k, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
        |         event_id
        |  FROM events
        |)
        |SELECT ev.event_id, ev.k AS user_id, ord.last_price
        |FROM ev ASOF LEFT JOIN ord ON ev.k = ord.k AND ev.t >= ord.t
        |ORDER BY event_id""".stripMargin,
    "events_type_day_cube" ->
      """SELECT event_type,
        |       CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY CUBE (event_type, day)
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,
    "olap_grouping_sets" ->
      """SELECT source, lang,
        |       CAST(GROUPING(source, lang) AS BIGINT) AS gid,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY GROUPING SETS ((source, lang), (source), ())
        |ORDER BY gid, source NULLS FIRST, lang NULLS FIRST""".stripMargin,
    "events_props_json" ->
      """SELECT (CAST(json_extract(props, '$.k') AS BIGINT)
        |        - ((CAST(json_extract(props, '$.k') AS BIGINT) % 10 + 10) % 10)) // 10 AS k_decile,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE json_extract(props, '$.k') IS NOT NULL
        |GROUP BY k_decile ORDER BY k_decile""".stripMargin,
    "orders_monthly" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY month ORDER BY month""".stripMargin,
    "events_sessionized" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        |  FROM events
        |), flagged AS (
        |  SELECT user_id,
        |         CASE WHEN sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
        |                OR LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |)
        |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_pivot_daily" ->
      """SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day,
        |       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS "view"
        |FROM events GROUP BY day ORDER BY day""".stripMargin,
    "orders_ship_delay" ->
      """SELECT CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS delay_days,
        |       COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY delay_days ORDER BY delay_days""".stripMargin,
    "events_rolling_stats" ->
      """SELECT user_id, event_id,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_sum,
        |       COUNT(*) OVER w AS roll_n,
        |       MAX(value) OVER w AS roll_max
        |FROM (SELECT event_id, user_id,
        |             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec, value
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    // Exact columns checked exactly; approx_ok = the 5%-error contract of
    // the sketches, asserted as a literal — Spark emitting `false` (sketch
    // drift) hash-mismatches and turns the driver gate red.
    "approx_stats" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |       COUNT(DISTINCT l_partkey) AS exact_parts,
        |       TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "heavy_hitters_cms" ->
      """SELECT word, n_true, TRUE AS cms_ok FROM (
        |  SELECT word, COUNT(*) AS n_true
        |  FROM (SELECT UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        |        FROM documents)
        |  GROUP BY word ORDER BY n_true DESC, word LIMIT 10
        |) ORDER BY word""".stripMargin,
    "events_percentiles" ->
      """SELECT event_type,
        |       quantile_cont(value, 0.5) AS p50,
        |       quantile_cont(value, 0.9) AS p90,
        |       quantile_cont(value, 0.99) AS p99,
        |       COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_lateness_histogram" ->
      """WITH t AS (
        |  SELECT event_id,
        |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        |  FROM events
        |), a0 AS (
        |  SELECT event_id, sec,
        |         sec + CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) % 3600 AS arr
        |  FROM t
        |), a AS (
        |  SELECT event_id, sec, (arr - ((arr % 60 + 60) % 60)) // 60 AS arr_min FROM a0
        |), b AS (
        |  SELECT arr_min, MAX(sec) AS max_sec FROM a GROUP BY arr_min
        |), p AS (
        |  SELECT arr_min,
        |         MAX(max_sec) OVER (ORDER BY arr_min
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm_before
        |  FROM b
        |)
        |SELECT GREATEST(p.hwm_before - a.sec, 0) // 300 AS late_bucket,
        |       COUNT(*) AS n_events
        |FROM a JOIN p USING (arr_min)
        |WHERE p.hwm_before IS NOT NULL
        |GROUP BY 1 ORDER BY late_bucket""".stripMargin,
    "set_ops_counts" ->
      """WITH a AS (
        |  SELECT DISTINCT c_custkey AS k, 1 AS in_a FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |), b AS (
        |  SELECT DISTINCT c_custkey AS k, 1 AS in_b FROM customer WHERE c_acctbal > 5000.0
        |)
        |SELECT COUNT(*) AS n_union,
        |       CAST(SUM(CASE WHEN in_a IS NOT NULL AND in_b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_intersect,
        |       CAST(SUM(CASE WHEN in_a IS NOT NULL AND in_b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_except
        |FROM a FULL OUTER JOIN b USING (k)""".stripMargin,
    "dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM (SELECT doc_id, LOWER(TRIM(text)) AS norm FROM documents)
        |GROUP BY norm ORDER BY doc_id""".stripMargin,
    "events_funnel" ->
      """WITH e AS (
        |  SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec, event_type
        |  FROM events
        |), w1 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN sec END)
        |              OVER (PARTITION BY user_id) AS t1 FROM e
        |), w2 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'click'
        |                      AND sec >= t1 AND sec <= t1 + 86400 THEN sec END)
        |              OVER (PARTITION BY user_id) AS t2 FROM w1
        |), w3 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'purchase'
        |                      AND sec >= t2 AND sec <= t2 + 86400 THEN sec END)
        |              OVER (PARTITION BY user_id) AS t3 FROM w2
        |), u AS (
        |  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
        |  FROM w3 GROUP BY user_id
        |)
        |SELECT COUNT(*) AS n_users,
        |       CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
        |       CAST(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked,
        |       CAST(SUM(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased
        |FROM u""".stripMargin,
    "dedup_exact_group_sizes" ->
      """SELECT sz, COUNT(*) AS n_groups FROM (
        |  SELECT COUNT(*) AS sz
        |  FROM (SELECT LOWER(TRIM(text)) AS norm FROM documents)
        |  GROUP BY norm
        |) GROUP BY sz ORDER BY sz""".stripMargin,
    "text_wordcount_topk" ->
      """SELECT word, COUNT(*) AS n
        |FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word
        |ORDER BY n DESC, word LIMIT 20""".stripMargin,
    "sim_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qv,
        |         (SELECT SUM(u * u) FROM UNNEST(qv) AS t(u)) AS norm2
        |  FROM q
        |), pairs AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |         (SELECT SUM(a * b) FROM (SELECT UNNEST(p.qv) AS a, UNNEST(c.qv) AS b)) AS dot,
        |         p.norm2 AS pn, c.norm2 AS cn
        |  FROM n p, n c
        |  WHERE p.vec_id < 5 AND c.vec_id <> p.vec_id
        |), ranked AS (
        |  SELECT probe_id, cand_id, dot / (sqrt(pn) * sqrt(cn)) AS cos,
        |         ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY dot / (sqrt(pn) * sqrt(cn)) DESC, cand_id) AS rank
        |  FROM pairs
        |)
        |SELECT probe_id, cand_id, round(cos, 6) AS score
        |FROM ranked WHERE rank <= 5 ORDER BY probe_id, cand_id""".stripMargin,
    "events_tumbling_agg" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY hour_epoch, event_type
        |ORDER BY hour_epoch, event_type""".stripMargin,
    "events_sessionless_stats" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |       COUNT(DISTINCT event_type) AS n_types,
        |       MIN(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS first_sec,
        |       MAX(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS last_sec,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "join_star_rollup" ->
      """SELECT n_name, c_mktsegment,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
  )
}
