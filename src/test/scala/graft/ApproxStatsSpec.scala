package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Numeric error bounds for the sketch aggregates behind `approx_stats` —
  * the oracle gate checks the 5% contract boolean; this spec pins the
  * actual relative errors so a regression shows the numbers, not just a
  * flipped flag. */
class ApproxStatsSpec extends SparkSpec {

  test("approx_count_distinct(rsd=0.02) within 5% of exact per returnflag") {
    val rows = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"),
           approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      val err = math.abs(approx - exact) / exact
      assert(err <= 0.05, s"${r.get(0)}: HLL++ err $err > 5% (exact=$exact approx=$approx)")
    }
  }

  test("percentile_approx(0.5, acc=1000) within 5% of exact median per returnflag") {
    val rows = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(call_function("percentile", col("l_extendedprice"), lit(0.5)).as("exact"),
           percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Double]("exact")
      val approx = r.getAs[Double]("approx")
      val err = math.abs(approx - exact) / math.abs(exact)
      assert(err <= 0.05, s"${r.get(0)}: quantile-sketch err $err > 5% (exact=$exact approx=$approx)")
    }
  }
}
