package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities — the engine's answer to the reference's probe
  * imbalance detection (src/bare_hash_container.h:135-148 warns/throws when
  * probe chains exceed 64 on a quarter-full table).
  *
  * Spark's first line of defense is AQE (skew-join splitting + partition
  * coalescing, on by default). These helpers cover the case AQE does not:
  * extreme single-key skew in aggregations, where one reduce key swamps one
  * task. The recipe is two-phase salted aggregation:
  *
  *   1. add a salt in [0, S) that cycles with row position (partition id +
  *      row offset — NOT a content hash, which would put identical hot-key
  *      rows in one bucket and defeat the spread) and aggregate on
  *      (key, salt); the hot key spreads over S tasks, partials combine;
  *   2. re-aggregate the S partials on key.
  *
  * Only ASSOCIATIVE aggregates survive two-phase splitting; this utility
  * accepts (partial, final) column pairs so e.g. count becomes
  * count→sum. At 100 TB, pick S ≈ a few × parallelism for the hot keys;
  * salting everything costs one extra (cheap, S-way smaller) shuffle.
  */
object Skew {

  /** Two-phase salted sum-like aggregation.
    *
    * @param df      input
    * @param key     group-by key column name
    * @param salts   number of salt buckets (S)
    * @param aggs    (alias, partialAgg, finalAgg) triples; partial runs on
    *                (key, salt), final re-combines partials per key, e.g.
    *                ("n", count(lit(1)), sum) for a skew-safe count.
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
                aggs: Seq[(String, Column, Column => Column)]): DataFrame = {
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted
      .groupBy(col(key), col("__salt"))
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
           aggs.tail.map { case (n, p, _) => p.as(s"__p_$n") }: _*)
    partial
      .groupBy(col(key))
      .agg(aggs.head._3(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
           aggs.tail.map { case (n, _, f) => f(col(s"__p_$n")).as(n) }: _*)
  }

  /** Salted equi-join for hot-key skew when the other side is too big to
    * broadcast but small enough to replicate S× (the classic middle
    * ground AQE's skew splitting can miss when one key dominates a
    * partition beyond the split factor): the big side gets a positional
    * salt in [0, S), the small side is exploded to every salt value, and
    * the join runs on (key, salt) — the hot key's probe rows spread over
    * S tasks. Each (big, small) row pair matches at exactly one salt, so
    * the result multiset is identical to the plain inner equi-join
    * (SkewSpec asserts this with broadcasting disabled, plus the
    * two-key join shape). Cost: S copies of the small side through the
    * shuffle — pick S ≈ a few × parallelism. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, "saltedJoin needs at least one salt bucket")
    val saltedBig = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
