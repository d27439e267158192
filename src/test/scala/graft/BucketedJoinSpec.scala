package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.sources.{Bucketing, Tables}

/** Plan-shape evidence for the 100 TB co-located-join lever (VERDICT.md
  * round-1 gap #8): materialize lineitem/orders bucketed on the join key
  * and assert the fact-fact join and the follow-on keyed aggregation plan
  * with ZERO shuffle exchanges — the layout, not the optimizer, carries
  * the partitioning. */
class BucketedJoinSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed fact-fact join + keyed agg plans with zero shuffle exchanges") {
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"),
      "l_orderkey", 8, "lineitem_bucketed")
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice"),
      "o_orderkey", 8, "orders_bucketed")
    // Disable broadcast (sf0.001 orders is tiny and would broadcast,
    // hiding the property under test) and AQE (so executedPlan is the
    // final static plan, traversable without running the query).
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.table("lineitem_bucketed")
        .join(spark.table("orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("qty"), max("o_totalprice").as("top"))
      val plan = joined.queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"expected no Exchange on bucketed join+agg, got ${shuffles.size}:\n$plan")
      // and the result is still right: every order key joins
      assert(joined.count() == spark.table("orders_bucketed")
        .join(spark.table("lineitem_bucketed"),
          col("o_orderkey") === col("l_orderkey"), "left_semi").count())
    }
  }

  test("declared join_bucketed_revenue: no exchange below the output sort") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val df = SparkEntry.queries("join_bucketed_revenue")(spark, sfDir)
      val plan = df.queryExecution.executedPlan
      val smj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, s"expected a sort-merge join on the bucketed pair:\n$plan")
      // The join subtree AND the keyed aggregate read the bucket layout's
      // partitioning: the only exchange in the whole plan is the range
      // partitioning of the final ORDER BY.
      val below = smj.head.collect { case e: ShuffleExchangeExec => e }
      assert(below.isEmpty, s"bucketed join must not shuffle its inputs:\n$plan")
      val all = plan.collect { case e: ShuffleExchangeExec => e }
      assert(all.size <= 1,
        s"expected at most the ORDER BY range exchange, got ${all.size}:\n$plan")
      assert(df.limit(1).count() == 1)
    }
  }

  test("zero-exchange property holds at a non-default bucket width") {
    // VERDICT r5 next #7: `Bucketing.buckets` is SPARK_GRAFT_CPUS-driven
    // (new in round 5) and the zero-exchange join REQUIRES both sides on
    // one count — so pin the property at a second, non-default width
    // (and one that does NOT divide the session's shuffle partitions,
    // the shape a mis-sized deployment would hit).
    val width = 5
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"),
      "l_orderkey", width, "lineitem_bucketed_w5")
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice"),
      "o_orderkey", width, "orders_bucketed_w5")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.table("lineitem_bucketed_w5")
        .join(spark.table("orders_bucketed_w5"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("qty"), max("o_totalprice").as("top"))
      val plan = joined.queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"expected no Exchange on $width-bucket join+agg, got ${shuffles.size}:\n$plan")
      assert(joined.count() == spark.table("orders_bucketed_w5")
        .join(spark.table("lineitem_bucketed_w5"),
          col("o_orderkey") === col("l_orderkey"), "left_semi").count())
    }
  }

  test("unbucketed baseline of the same join DOES shuffle (the lever is real)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val plain = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
        .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("qty"))
      val shuffles = plain.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty, "baseline should shuffle; bucketing comparison is vacuous")
    }
  }
}
