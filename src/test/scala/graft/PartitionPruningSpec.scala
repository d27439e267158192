package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Plan-shape evidence for partition pruning — with date/label-partitioned
  * layout (the standard 100 TB table organization), a filter on the
  * partition column must prune at the METADATA level: the scan's selected
  * partition count drops before any file is opened. Together with
  * BucketedJoinSpec this covers the two physical-layout levers: partition
  * pruning bounds what is read, bucketing bounds what is shuffled. */
class PartitionPruningSpec extends SparkSpec {

  test("filter on partition column prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.orders(spark, sfDir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year")
      .parquet(s"$dir/orders_by_year.parquet")
    val all = spark.read.parquet(s"$dir/orders_by_year.parquet")
    val nYears = all.select("o_year").distinct().count()
    assert(nYears > 1, "fixture spans one year; pruning test is vacuous")

    val pruned = all.filter(col("o_year") === 1995)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    // executedPlan under AQE is an adaptive wrapper that hides the scan
    // until execution; inspect with AQE off (the static plan's pruning is
    // what AQE starts from).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans =
      try pruned.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(scans.nonEmpty)
    // selectedPartitions is evaluated at planning from catalog metadata —
    // exactly one of the year directories may survive the filter.
    assert(scans.head.selectedPartitions.partitionCount == 1,
      s"expected 1 selected partition, got ${scans.head.selectedPartitions.partitionCount}")
    // and the partition filter is visible in the scan node itself
    assert(scans.head.partitionFilters.nonEmpty)
    // correctness: pruned result equals the unpartitioned filter
    val expected = Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === 1995)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(pruned.orderBy("o_orderpriority").collect().toSeq ==
      expected.orderBy("o_orderpriority").collect().toSeq)
  }
}
