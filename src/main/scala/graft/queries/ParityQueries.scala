package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.ColFns._

/** The hpmr parity inventory (SURVEY §2.3): each query re-expresses one
  * reference operator (SURVEY §2.1 #) as a declarative Spark plan whose
  * result is hash-checked against a DuckDB oracle.
  *
  * Scale posture (100 TB): every query is a pure DataFrame plan — shuffles
  * only on group-by keys, no driver collect, no RDDs; Catalyst pushes
  * filters/projections into the parquet scan and AQE picks join strategies
  * and coalesces post-shuffle partitions at runtime.
  */
object ParityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** #1/#3/#4/#17 — the canonical mapreduce: scan → map-side partial agg →
    * hash shuffle → final merge (hpmr src/dist_map_test.cc:71-88 reduces 1M
    * KV pairs with Reducer::sum; here: lineitem quantities by returnflag). */
  val mrSumByKey: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(decSum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** #2 — KV→KV re-key mapreduce (hpmr src/dist_map.h:255-279): orders
    * re-keyed to customer, re-aggregated. */
  val mrFanoutRemap: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(decSum2(col("o_totalprice")).as("total_spend"),
           count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  /** #1 — Range source mapreduce (hpmr src/range.h:28-64, range_test.cc:6-16):
    * spark.range is the direct analog of Range<T>(start,end,step). */
  val mrRangeSource: Q = (s, _) =>
    s.range(0L, 100000L)
      .groupBy((col("id") % 1000L).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** #5 — DistMap::get point lookup with default (hpmr src/dist_map.h:132-145).
    * Absent key ⇒ caller default, exactly hpmr's default_value.
    *
    * Shape note: an outer join can only broadcast its non-preserved side,
    * so `customer RIGHT JOIN broadcast(keys)` would silently drop the hint
    * and shuffle the whole table at scale. Instead: inner join with the
    * tiny key set broadcast (BuildRight is legal), then union the missed
    * keys back with the default via a broadcast anti join against the
    * (even tinier) present-key set — every join builds on the small side. */
  val pointGet: Q = (s, d) => {
    import s.implicits._
    val keys = Seq(1L, 42L, 99999999L).toDF("k")
    // coalesce on the present branch too: a present key with a NULL
    // acctbal must yield the default, matching the oracle's COALESCE
    // (latent on generated data, which has no NULL balances).
    val present = Tables.customer(s, d)
      .join(broadcast(keys), col("c_custkey") === col("k"))
      .select(col("k"), coalesce(col("c_acctbal"), lit(-1.0)).as("acctbal"))
    val absent = keys
      .join(broadcast(present.select("k")), Seq("k"), "left_anti")
      .withColumn("acctbal", lit(-1.0))
    present.unionByName(absent).orderBy("k")
  }

  /** #8/#9 — set membership as a left-semi join (hpmr
    * src/bare_hash_container.h:181-196 `has`). */
  val membershipSemi: Q = (s, d) => {
    val keep = Tables.part(s, d).filter(col("p_size") > 25).select("p_partkey")
    Tables.lineitem(s, d)
      .join(keep, col("l_partkey") === col("p_partkey"), "left_semi")
      .select("l_partkey").distinct()
      .orderBy("l_partkey")
  }

  /** #7 — unset/delete as a left-anti join (hpmr
    * src/bare_hash_container.h:150-179 backshift delete). */
  val unsetAnti: Q = (s, d) => {
    val orders = Tables.orders(s, d)
    val deleted = orders.filter(col("o_orderkey") % 10 === 0).select(col("o_orderkey").as("del_key"))
    orders.join(deleted, col("o_orderkey") === col("del_key"), "left_anti")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** #9/#10 — set insert + get_n_keys (hpmr src/dist_map.h:90-96): global
    * distinct-key counts. Spark plans this as partial distinct + exchange +
    * final — the same two-phase shape as hpmr's staged sets. */
  val distinctKeys: Q = (s, d) =>
    Tables.lineitem(s, d)
      .agg(countDistinct(col("l_partkey")).as("n_part_keys"),
           countDistinct(col("l_suppkey")).as("n_supp_keys"))

  /** #17 — Reducer::min/max by group. NOTE the reference's comparisons are
    * swapped (src/reducer.h:16-22: `min` keeps the larger value); we
    * implement the correct semantics and record the divergence (SURVEY §1.3). */
  val reduceMinMax: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(min(col("l_quantity")).as("min_qty"),
           max(col("l_quantity")).as("max_qty"),
           min(col("l_extendedprice")).as("min_price"),
           max(col("l_extendedprice")).as("max_price"))
      .orderBy("l_returnflag", "l_linestatus")

  /** #17 — Reducer::keep (first-write-wins) / overwrite (last-write-wins),
    * src/reducer.h:10-12. Order-dependent under parallelism (SURVEY §1.3),
    * so declared deterministically as min_by/max_by over the unique
    * o_orderkey write order. */
  val reduceFirstLast: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"),
           max_by(col("o_totalprice"), col("o_orderkey")).as("last_price"))
      .orderBy("o_custkey")

  /** #13 — for_each full scan + projection (hpmr src/bare_map.h:83-93),
    * sorted for hash stability. */
  val fullScanProject: Q = (s, d) =>
    Tables.nation(s, d)
      .select(col("n_nationkey"), upper(col("n_name")).as("name_u"),
              col("n_regionkey"))
      .orderBy("n_nationkey")

  /** #2 chained — mapreduce over a mapreduce result (hpmr's DistMap is
    * both sink and source, src/dist_map.h:255-279): lineitem → per-order
    * totals → re-keyed to order-buckets → re-aggregated. In Spark the
    * intermediate store is just lineage; Catalyst plans both aggregations
    * with partial/final phases back to back. */
  val mrChainRemap: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(decSum2(col("l_quantity")).as("order_qty"))
      .groupBy((col("l_orderkey") % 100L).as("bucket"))
      .agg(sum(col("order_qty").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
             .cast("double").as("sum_qty"),
           count(lit(1)).as("n_orders"))
      .orderBy("bucket")

  /** #2/#17 — typed COGROUP: hpmr merges two keyed stores by feeding both
    * sides' entries for a key through an arbitrary combine fn
    * (src/dist_map.h:31-39 reducer over `async_set` streams from any
    * producer); Spark's typed analog is KeyValueGroupedDataset.cogroup,
    * the one first-class typed-merge API the inventory hadn't declared.
    * Here: each order cogrouped with its lineitems → (order, total_price,
    * exact summed quantity). The user fn only computes order-insensitive
    * sums, so the result is deterministic under any partitioning; at
    * scale cogroup plans one hash exchange per side on the key (same
    * shuffle bill as the equivalent join+agg, but with arbitrary
    * user-code merge semantics the declarative form can't express). */
  val cogroupFillRatio: Q = (s, d) => {
    import s.implicits._
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey").as("_1"), col("o_totalprice").as("_2"))
      .as[(Long, Double)]
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("_1"), col("l_quantity").as("_2"))
      .as[(Long, Double)]
    ord.groupByKey(_._1).cogroup(li.groupByKey(_._1)) { (k, os, ls) =>
      val orders = os.toSeq
      // quantities are integer-valued; summing as Long keeps it exact
      val qty = ls.foldLeft(0L)((acc, l) => acc + l._2.toLong)
      orders.iterator.map(o => (k, o._2, qty))
    }.toDF("o_orderkey", "total_price", "sum_qty")
      .orderBy("o_orderkey")
  }

  /** #17 arbitrary user reducer as a declared query: the Aggregator from
    * Reducers.reduceWith registered as a UDAF — hpmr's `std::function`
    * combine surface (src/dist_map.h:31-39) on the DataFrame path.
    * l_quantity values are integer-valued doubles, so the user fn's
    * partition-order float sums are still exact and deterministic. */
  val reduceCustomUdaf: Q = (s, d) => {
    implicit val de: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
    val userReducer = udaf(graft.core.Reducers.reduceWith[Double](0.0, _ + _))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(userReducer(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** Skew posture as a DECLARED query (upgrades the round-1
    * property-test-only coverage): two-phase salted aggregation via
    * graft.operators.Skew — partial agg on (key, positional salt), final
    * re-combine per key. The result equals the plain GROUP BY (associative
    * aggregates only), which is exactly what the oracle checks; the plan
    * shows the two HashAggregate+Exchange phases. The reference's
    * counterpart is probe-imbalance detection
    * (src/bare_hash_container.h:135-148); salting is the engine's remedy
    * when one reduce key swamps one task. Double sums go through DECIMAL
    * per the determinism doctrine, so partial order cannot change bits. */
  val skewSaltedAgg: Q = (s, d) =>
    graft.operators.Skew.saltedAgg(
      Tables.events(s, d), "event_type", 16,
      Seq(
        ("n", count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
        ("sum_value",
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))),
          (c: org.apache.spark.sql.Column) => sum(c).cast("double"))))
      .orderBy("event_type")

  /** The join-side skew remedy as a DECLARED query: enrich every event
    * with its type's global mean via Skew.saltedJoin — the 5-key
    * event_type distribution is exactly the hot-key shape where a plain
    * shuffle join lands each whole key on one task. The salted form
    * spreads each key over 8 salt tasks and replicates the 5-row stats
    * side 8×; the result is identical to the plain join, which is what
    * the oracle computes. Above-mean counting keeps the output exact:
    * the mean is an exact DECIMAL sum over one IEEE division, and the
    * comparison is on raw doubles — no rounded value is emitted. */
  val skewSaltedJoin: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("event_type"), col("value"))
    val stats = e.groupBy("event_type")
      .agg((sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double") / count(lit(1))).as("avg_value"))
    graft.operators.Skew.saltedJoin(e, stats, "event_type", 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           sum(when(col("value") > col("avg_value"), 1L).otherwise(0L)).as("n_above_avg"))
      .orderBy("event_type")
  }

  /** #11 — bucket/load-factor statistics (hpmr
    * src/bare_concurrent_container.h:30-32 `get_n_buckets` /
    * `get_load_factor`) as an observable query: assign every orders key to
    * one of 32 hash buckets (md5-based, so the oracle computes the same
    * partitioning) and report occupancy stats — bucket count, min/max/total
    * size. This is the two-level-hash observability surface: at 100 TB the
    * same query over `spark_partition_id()` audits real partition balance;
    * the md5 form keeps it engine-portable and oracle-exact. */
  val bucketStats: Q = (s, d) =>
    Tables.orders(s, d)
      .select(pmod(md5Long(col("o_orderkey").cast("string")), lit(32)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_buckets"), min(col("sz")).as("min_size"),
           max(col("sz")).as("max_size"), sum(col("sz")).as("total"))

  val queries: Map[String, Q] = Map(
    "skew_salted_agg" -> skewSaltedAgg,
    "skew_salted_join" -> skewSaltedJoin,
    "bucket_stats" -> bucketStats,
    "mr_chain_remap" -> mrChainRemap,
    "reduce_custom_udaf" -> reduceCustomUdaf,
    "cogroup_fill_ratio" -> cogroupFillRatio,
    "mr_sum_by_key" -> mrSumByKey,
    "mr_fanout_remap" -> mrFanoutRemap,
    "mr_range_source" -> mrRangeSource,
    "point_get" -> pointGet,
    "membership_semi" -> membershipSemi,
    "unset_anti" -> unsetAnti,
    "distinct_keys" -> distinctKeys,
    "reduce_min_max" -> reduceMinMax,
    "reduce_first_last" -> reduceFirstLast,
    "full_scan_project" -> fullScanProject,
  )

  val oracles: Map[String, String] = Map(
    // CAST on the double quantity matches the fn's .toLong exactly
    // because quantities are integer-valued.
    "cogroup_fill_ratio" ->
      """SELECT o.o_orderkey, o.o_totalprice AS total_price,
        |       CAST(COALESCE(SUM(CAST(l.l_quantity AS BIGINT)), 0) AS BIGINT) AS sum_qty
        |FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderkey, o.o_totalprice
        |ORDER BY o.o_orderkey""".stripMargin,
    "skew_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // The oracle is the PLAIN join+agg: the salted form must be
    // result-identical, that identity is the contract under test.
    "skew_salted_join" ->
      """WITH stats AS (
        |  SELECT event_type,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CASE WHEN e.value > s.avg_value THEN 1 ELSE 0 END) AS BIGINT) AS n_above_avg
        |FROM events e JOIN stats s USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "bucket_stats" ->
      """WITH b AS (
        |  SELECT CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT) % 32 AS bucket
        |  FROM orders
        |), sz AS (
        |  SELECT bucket, COUNT(*) AS sz FROM b GROUP BY bucket
        |)
        |SELECT COUNT(*) AS n_buckets, MIN(sz) AS min_size,
        |       MAX(sz) AS max_size, CAST(SUM(sz) AS BIGINT) AS total
        |FROM sz""".stripMargin,
    "mr_chain_remap" ->
      """WITH per_order AS (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS order_qty
        |  FROM lineitem GROUP BY l_orderkey
        |)
        |SELECT l_orderkey % 100 AS bucket,
        |       CAST(SUM(CAST(order_qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n_orders
        |FROM per_order GROUP BY bucket ORDER BY bucket""".stripMargin,
    "reduce_custom_udaf" ->
      """SELECT l_returnflag, SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "mr_sum_by_key" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "mr_fanout_remap" ->
      """SELECT o_custkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "mr_range_source" ->
      """SELECT range % 1000 AS bucket, COUNT(*) AS n
        |FROM range(0, 100000) GROUP BY bucket ORDER BY bucket""".stripMargin,
    "point_get" ->
      """SELECT k, COALESCE(c_acctbal, -1.0) AS acctbal
        |FROM (VALUES (CAST(1 AS BIGINT)), (CAST(42 AS BIGINT)), (CAST(99999999 AS BIGINT))) AS v(k)
        |LEFT JOIN customer ON c_custkey = k ORDER BY k""".stripMargin,
    "membership_semi" ->
      """SELECT DISTINCT l_partkey FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 25)
        |ORDER BY l_partkey""".stripMargin,
    "unset_anti" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 0)
        |ORDER BY o_orderkey""".stripMargin,
    "distinct_keys" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_part_keys,
        |       COUNT(DISTINCT l_suppkey) AS n_supp_keys
        |FROM lineitem""".stripMargin,
    "reduce_min_max" ->
      """SELECT l_returnflag, l_linestatus,
        |       MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |       MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "reduce_first_last" ->
      """SELECT o_custkey,
        |       MIN_BY(o_totalprice, o_orderkey) AS first_price,
        |       MAX_BY(o_totalprice, o_orderkey) AS last_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "full_scan_project" ->
      """SELECT n_nationkey, UPPER(n_name) AS name_u, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
  )
}
