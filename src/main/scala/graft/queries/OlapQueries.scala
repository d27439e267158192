package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.ColFns._

/** Deep-star OLAP joins, trailing-window anomaly detection, and the
  * write-path shard assignment — the warehouse-side analytics a corpus
  * pipeline runs NEXT to its dedup/curation stages. Same doctrine as the
  * rest of the inventory: DECIMAL-exact money sums, integer-exact time
  * and statistics arithmetic, md5 for any content-addressed placement.
  */
object OlapQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Local-supply revenue by nation (the TPC-H Q5 shape): lineitem ⋈
    * orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region, keeping only lines
    * where the customer's nation supplies itself, restricted to one
    * region and a two-year order window. The scale-relevant choices:
    * date filter applied BEFORE the join chain so the orders scan prunes
    * at the parquet reader; nation/region broadcast (tiny at any scale);
    * customer/supplier/orders shuffle on their keys (supplier is ~10k ×
    * SF rows — NOT broadcastable at 100 TB, so no hint: AQE may elect
    * broadcast at test SF, a cluster planner won't); the c_nationkey =
    * s_nationkey equi-condition rides the supplier join, not a
    * post-filter, so the join output never carries mismatched pairs. */
  val joinSupplyRevenue: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    val nat = broadcast(Tables.nation(s, d))
    val reg = broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(decSum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Revenue and volume by part type — the product-dimension rollup
    * (TPC-H Q14 family). part is a real dimension (~200k × SF rows):
    * too big to pin broadcast at 100 TB, so the join is hint-free and
    * shuffles on partkey when AQE doesn't elect broadcast. Only the two
    * join/agg columns of part are read (ReadSchema pruning). */
  val partTypeRevenue: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(decSum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("p_type")

  /** Forecast-revenue band scan (the TPC-H Q6 shape): a pure
    * filter-and-aggregate with NO join — the plan that shows the scan
    * layer doing its job, because every predicate (ship-date range,
    * discount band, quantity cut) is pushable and the ReadSchema
    * shrinks to the four referenced columns of a 16-column table. At
    * 100 TB this is the difference between reading ~4 TB of pruned
    * column chunks and reading everything: with date-partitioned or
    * min/max-indexed parquet the date range also prunes whole files
    * before any byte moves. The discount band compares the stored
    * doubles against DOUBLE literals in both engines (the oracle casts
    * explicitly — DuckDB would otherwise type 0.05 as DECIMAL and
    * compare under different rules); the revenue sum takes the
    * [[graft.functions.ColFns.decSum4]] exact-decimal path. */
  val lineitemRevenueBand: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1997-01-01")
        && col("l_discount") >= lit(0.05d) && col("l_discount") <= lit(0.07d)
        && col("l_quantity") < lit(24.0d))
      .agg(decSum4(col("l_extendedprice") * col("l_discount")).as("revenue"),
           count(lit(1)).as("n_items"))

  /** Trailing-window anomaly detection over the event log: for each
    * (event_type, day), is the daily count a >3σ outlier against the
    * previous 7 observed days? The z-score test is evaluated in EXACT
    * integer algebra — counts are integers, so with k=7, S=Σn, Q=Σn²
    * over the trailing frame:  |z| > 3  ⇔  (k·n − S)²·(k−1) > 9·k·(k·Q − S²)
    * — no division, no floating point, bit-identical in any engine.
    * Products go through DECIMAL(38,0) (Spark) / HUGEINT (oracle) so the
    * squares cannot overflow at counts up to ~1e17/day. One shuffle on
    * event_type for the ordered frame; the aggregate input is already
    * the tiny (type, day) domain. See [[anomalyOf]]; OlapSpec drives a
    * planted-spike frame through it directly. */
  val eventsAnomalyZscore: Q = (s, d) =>
    anomalyOf(
      Tables.events(s, d)
        .groupBy(col("event_type"),
          floorDiv(nsToEpochSec(col("ts")), 86400L).as("day"))
        .agg(count(lit(1)).as("n")))

  /** Core of events_anomaly_zscore over any (event_type, day, n) frame.
    * Trailing frame = the previous 7 OBSERVED days (ROWS, not RANGE —
    * gap days contribute nothing either way; a zero-filled calendar
    * would need a dimension join the fixture doesn't warrant). Rows
    * without a full 7-day history are dropped: a cold-start mean is
    * noise, not a baseline. */
  def anomalyOf(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    daily
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("s", sum(col("n")).over(w))
      // The squares accumulate in DECIMAL, not LONG: n² overflows a
      // BIGINT once a (type, day) cell passes ~3e9 events — realistic at
      // 100 TB — and Spark would wrap silently where DuckDB errors.
      .withColumn("q", sum(col("n").cast(dec) * col("n").cast(dec)).over(w))
      .filter(col("k") === 7L)
      .select(col("event_type"), col("day"), col("n"),
        ((col("k") * col("n") - col("s")).cast(dec)
           * (col("k") * col("n") - col("s")).cast(dec)
           * (col("k") - 1L).cast(dec)
          > lit(9).cast(dec) * col("k").cast(dec)
            * (col("k").cast(dec) * col("q").cast(dec)
               - col("s").cast(dec) * col("s").cast(dec))).as("anomaly"))
      .orderBy("event_type", "day")
  }

  /** Deterministic shard assignment — the write path of a training-data
    * export: every document lands in one of 16 shards by content-free
    * md5(doc_id), and the query reports per-shard document count and
    * byte volume (the balance evidence). md5 placement is engine- and
    * partitioning-independent (same doctrine as the sampling family —
    * no RNG, no engine-native hash), so a re-export reproduces the same
    * shards byte-for-byte. At scale this exact frame feeds
    * `.repartition(nShards, col("shard")).write` — uniform md5 spread
    * is what makes those output files even-sized. */
  val corpusShards: Q = (s, d) =>
    Tables.documents(s, d)
      .select(pmod(md5Long(col("doc_id").cast("string")), lit(16L)).as("shard"),
        col("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("shard")

  /** Per-order revenue over the BUCKETED fact pair — the declared form of
    * DESIGN.md's 100 TB fact-fact answer (round-3 verdict #5): lineitem ⋈
    * orders both bucketed+sorted on the order key, so the join AND the
    * keyed aggregate plan with zero shuffle exchanges below the output
    * sort — the layout, not the optimizer, carries the partitioning
    * (BucketedJoinSpec asserts the plan shape on this declared query; the
    * oracle is the PLAIN join, proving the layout changes nothing about
    * the answer). [[graft.sources.Bucketing.bucketedFacts]] materializes
    * the tables once per source dir — the ingest-time cost a warehouse
    * amortizes over every fact-fact query after it. */
  val joinBucketedRevenue: Q = (s, d) => {
    val (li, ord) = graft.sources.Bucketing.bucketedFacts(s, d)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(decSum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_items"),
           max(col("o_totalprice")).as("o_total"))
      .orderBy("l_orderkey")
  }

  val queries: Map[String, Q] = Map(
    "join_supply_revenue" -> joinSupplyRevenue,
    "part_type_revenue" -> partTypeRevenue,
    "join_bucketed_revenue" -> joinBucketedRevenue,
    "events_anomaly_zscore" -> eventsAnomalyZscore,
    "corpus_shards" -> corpusShards,
    "lineitem_revenue_band" -> lineitemRevenueBand,
  )

  val oracles: Map[String, String] = Map(
    "lineitem_revenue_band" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount >= CAST(0.05 AS DOUBLE)
        |  AND l_discount <= CAST(0.07 AS DOUBLE)
        |  AND l_quantity < CAST(24.0 AS DOUBLE)""".stripMargin,
    "join_supply_revenue" ->
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // Plain (unbucketed) join: the physical layout must not change the
    // answer, so the oracle deliberately ignores the bucketing.
    "join_bucketed_revenue" ->
      """SELECT l_orderkey,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items,
        |       MAX(o_totalprice) AS o_total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "part_type_revenue" ->
      """SELECT p_type,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type ORDER BY p_type""".stripMargin,
    "events_anomaly_zscore" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day,
        |         COUNT(*) AS n
        |  FROM events GROUP BY event_type, day
        |), stats AS (
        |  SELECT event_type, day, n,
        |         COUNT(*) OVER w AS k, SUM(n) OVER w AS s,
        |         SUM(CAST(n AS HUGEINT) * n) OVER w AS q
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_type, day, n,
        |       (CAST(k * n - s AS HUGEINT) * CAST(k * n - s AS HUGEINT) * CAST(k - 1 AS HUGEINT)
        |        > 9 * CAST(k AS HUGEINT) * (CAST(k AS HUGEINT) * CAST(q AS HUGEINT)
        |                                    - CAST(s AS HUGEINT) * CAST(s AS HUGEINT))) AS anomaly
        |FROM stats WHERE k = 7
        |ORDER BY event_type, day""".stripMargin,
    "corpus_shards" ->
      """SELECT CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 16 AS shard,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY shard ORDER BY shard""".stripMargin,
  )
}
