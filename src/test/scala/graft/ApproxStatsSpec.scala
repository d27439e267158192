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

  /** Round-19: approx_stats computes the exact median with a sort-based
    * window pick (row_number over price order, Percentile's interpolation
    * formula verbatim) instead of the boxed-hash-map `percentile`
    * aggregate. Pin BIT equality of the two forms — on the fixture and on
    * synthetic odd/even/duplicate-heavy/negative groups. */
  test("window-pick exact median ≡ percentile(0.5) bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    def windowMedian(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val wOrd = Window.partitionBy("g").orderBy("v")
      val wAll = Window.partitionBy("g")
      val pos = (col("cnt") - 1L).cast("double") * lit(0.5)
      df.filter(col("v").isNotNull)
        .withColumn("r", row_number().over(wOrd))
        .withColumn("cnt", count(lit(1)).over(wAll))
        .filter(col("r") === floor(pos).cast("long") + 1L ||
                col("r") === ceil(pos).cast("long") + 1L)
        .groupBy("g")
        .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
             min(pos - floor(pos)).as("fr"))
        .select(col("g"),
          (col("lo") + (col("hi") - col("lo")) * col("fr")).as("m"))
    }
    val fixture = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val synth = Seq(
      ("odd1", 1.0), ("odd1", 3.0), ("odd1", 2.0),
      ("even", 1.0), ("even", 2.0), ("even", 3.0), ("even", 4.0),
      ("one", 42.5),
      ("dups", 5.0), ("dups", 5.0), ("dups", 5.0), ("dups", 7.0),
      ("neg", -3.25), ("neg", -1.5), ("neg", 8.0), ("neg", -9.75))
      .toDF("g", "v")
    for (df <- Seq(fixture, synth)) {
      val win = windowMedian(df).withColumnRenamed("m", "win")
      val agg = df.groupBy("g")
        .agg(call_function("percentile", col("v"), lit(0.5)).as("pct"))
      val joined = win.join(agg, "g")
      // <=> over doubles is bit-comparison up to NaN; the two forms must
      // agree EXACTLY, not within epsilon.
      assert(joined.filter(not(col("win") <=> col("pct"))).count() == 0)
    }
  }
}
