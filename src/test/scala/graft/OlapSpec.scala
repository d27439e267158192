package graft

import org.apache.spark.sql.functions._
import graft.queries.OlapQueries

/** Pins the OLAP/anomaly/shard family's semantics on synthetic frames —
  * the oracle gate checks fixture parity; these tests check the branches
  * the fixture may not reach (a planted spike MUST flag, steady noise
  * MUST NOT, shards MUST partition the corpus exactly).
  */
class OlapSpec extends SparkSpec {
  import spark.implicits._

  private def daily(rows: (String, Long, Long)*) =
    rows.toDF("event_type", "day", "n")

  test("anomalyOf flags a planted 5x spike after a steady week") {
    val steady = (0L to 6L).map(d => ("click", d, 100L + (d % 3))) // tiny real variance
    val out = OlapQueries.anomalyOf(daily(steady :+ (("click", 7L, 500L)): _*))
      .collect().map(r => (r.getLong(1), r.getBoolean(3))).toMap
    assert(out == Map(7L -> true)) // only day 7 has a full trailing week
  }

  test("anomalyOf stays quiet on steady noisy data") {
    val steady = (0L to 20L).map(d => ("view", d, 100L + (d * 7 % 11)))
    val out = OlapQueries.anomalyOf(daily(steady: _*)).collect()
    assert(out.length == 14) // days 7..20 have full windows
    assert(out.forall(!_.getBoolean(3)))
  }

  test("anomalyOf drops rows without a full 7-day history") {
    val out = OlapQueries.anomalyOf(daily((0L to 5L).map(d => ("e", d, 10L)): _*))
    assert(out.collect().isEmpty)
  }

  test("anomalyOf zero-variance baseline flags any deviation") {
    val flat = (0L to 6L).map(d => ("e", d, 50L))
    val out = OlapQueries.anomalyOf(daily(flat :+ (("e", 7L, 51L)): _*))
      .collect()
    assert(out.length == 1 && out.head.getBoolean(3))
  }

  test("corpus_shards partitions the corpus exactly (no loss, no overlap)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val total = docs.count()
    val shards = OlapQueries.corpusShards(spark, sfDir).collect()
    assert(shards.map(_.getLong(1)).sum == total)
    assert(shards.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 16))
    val totalChars = docs.agg(sum("n_chars")).head.getLong(0)
    assert(shards.map(_.getLong(2)).sum == totalChars)
  }

  test("join_supply_revenue pushes the date filter to the orders scan and broadcasts the tiny dims") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val qe = OlapQueries.joinSupplyRevenue(spark, sfDir).queryExecution
    // Initial physical plan (pre-AQE): the o_orderdate predicate must
    // reach a parquet scan as a data filter — at 100 TB this is the
    // difference between scanning two years and scanning the table.
    val scans = qe.sparkPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.exists(_.dataFilters.exists(
      _.references.exists(_.name == "o_orderdate"))),
      scans.map(_.dataFilters).mkString("; "))
    // The two explicit broadcast() hints (nation, region) must survive
    // planning; the real dimensions are deliberately un-hinted.
    val bhj = qe.sparkPlan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2, s"expected >=2 broadcast joins, got ${bhj.size}")
  }

  test("join_supply_revenue keeps only local-supply lines") {
    // Every surviving (customer, supplier) pair shares a nation by
    // construction; re-deriving the join with the condition dropped must
    // yield a strict superset of items.
    val strict = OlapQueries.joinSupplyRevenue(spark, sfDir)
      .agg(sum("n_items")).head.getLong(0)
    val s = spark; val d = sfDir
    val loose = graft.sources.Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
      .join(graft.sources.Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01")
          && col("o_orderdate") < lit("1998-01-01"))
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.sources.Tables.customer(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.sources.Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.sources.Tables.nation(s, d),
        col("s_nationkey") === col("n_nationkey"))
      .join(graft.sources.Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .count()
    assert(strict > 0 && strict <= loose)
  }
}
