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
  *   1. add a salt in [0, S) derived from a CONTENT hash of the full row
  *      and aggregate on (key, salt); the hot key's distinct payloads
  *      spread over S tasks, partials combine;
  *   2. re-aggregate the S partials on key.
  *
  * Why content, not position: a positional salt (partition id + row
  * offset) is not stable under task retry — when the input is itself
  * shuffle output, a partially recomputed map stage re-salts its rows
  * differently and the (key, salt) shuffle can double-count or drop rows
  * (the SPARK-23207 indeterminate-output class), silently, exactly at the
  * scale where retries happen. The content hash is retry-stable, and it
  * does NOT defeat the spread for aggregation: byte-identical rows
  * collapse into one partial in the MAP-SIDE combine before anything
  * shuffles, so what must spread across tasks is the hot key's distinct
  * payloads — which a content hash spreads uniformly. (For the join
  * below, a hot key whose rows are byte-identical does degrade to one
  * salt — correctness holds; add any distinguishing column upstream to
  * restore spread.)
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
    require(!df.columns.contains("__salt"),
      "input must not contain the reserved salt column '__salt'")
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(salts)))
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
    * partition beyond the split factor): the big side gets a
    * content-hash salt in [0, S) (retry-stable — see the object note),
    * the small side is exploded to every salt value, and
    * the join runs on (key, salt) — the hot key's probe rows spread over
    * S tasks. Each (big, small) row pair matches at exactly one salt, so
    * the result multiset is identical to the plain inner equi-join
    * (SkewSpec asserts this with broadcasting disabled, plus the
    * two-key join shape). Cost: S copies of the small side through the
    * shuffle — pick S ≈ a few × parallelism. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, "saltedJoin needs at least one salt bucket")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not contain the reserved salt column '__salt'")
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
