package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range (interval) join — points `t` matched to intervals
  * `[start, end)`. Spark plans a raw inequality join as
  * BroadcastNestedLoopJoin, O(points × intervals); binning the axis turns
  * it into an equi-join on bin id plus an exact residual filter:
  *
  *   - each interval explodes to the bins it covers
  *     (O(len/binWidth + 1) rows per interval);
  *   - each point maps to exactly one bin;
  *   - the equi-join on bin prunes candidates to same-bin pairs, and the
  *     exact predicate `start <= t < end` keeps correctness.
  *
  * At 100 TB this is one hash exchange on bin id; pick binWidth near the
  * median interval length so the interval fan-out stays O(1) while bins
  * stay selective. Skewed bins (a hot time range) fall under AQE skew
  * handling like any other equi-join.
  */
object RangeJoin {

  /** @param points    frame with a numeric point column `t`
    * @param intervals frame with numeric `[start, end)` columns
    * @param binWidth  bin size in the same units as t/start/end (> 0)
    */
  def rangeJoin(points: DataFrame, t: String,
                intervals: DataFrame, start: String, end: String,
                binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // Fail fast on reserved working columns, the AsOf convention: a
    // caller's __pbin/__ibin would be silently clobbered or surface as
    // an ambiguous-reference error downstream.
    require(!points.columns.contains("__pbin"),
      "points must not contain the reserved range-join column '__pbin'")
    require(!intervals.columns.contains("__ibin"),
      "intervals must not contain the reserved range-join column '__ibin'")
    val iv = intervals
      // A corrupted interval with start > end would make sequence()
      // generate a DESCENDING bin range — potentially hundreds of
      // thousands of exploded rows per bad row that the residual filter
      // then discards (or an outright array-size error). An inequality
      // join would simply match nothing for such rows, so drop them
      // (this also drops null-bounded intervals, which can never match).
      .filter(col(start) <= col(end))
      .withColumn("__ibin",
        explode(sequence(call_function("div", col(start), lit(binWidth)),
                         call_function("div", col(end), lit(binWidth)))))
    val pt = points.withColumn("__pbin",
      call_function("div", col(t), lit(binWidth)))
    pt.join(iv, col("__pbin") === col("__ibin") &&
        col(t) >= col(start) && col(t) < col(end))
      .drop("__pbin", "__ibin")
  }
}
