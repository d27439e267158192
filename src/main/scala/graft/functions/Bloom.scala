package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftx.Bridge

/** Approximate membership via Spark's native bloom-filter expressions —
  * the 100 TB form of hpmr's `has()` (src/dist_map.h `has`): instead of
  * shuffling the probe side against the key set (a semi join), a compact
  * bloom of the key side ships to every task as a scalar-subquery
  * broadcast and filters the big scan in place, map-side. This is
  * EXACTLY the shape Spark's own InjectRuntimeFilter builds internally
  * (BloomFilterAggregate under a ScalarSubquery feeding
  * BloomFilterMightContain); the expressions are public Catalyst classes
  * but not registered SQL functions, so the Column wiring goes through
  * the same Bridge used for QDotProduct.
  *
  * Contract: no false negatives ever; false-positive rate set by
  * `expectedItems` vs the true key count (Spark sizes bits for ~3% FPP
  * at capacity — overprovision for less). Both are asserted as contract
  * booleans in the declared `bloom_membership` query rather than
  * hash-compared bit-for-bit (bloom bits are not portable to DuckDB;
  * the approx_stats precedent).
  */
object Bloom {

  /** Aggregate Column building a bloom filter over xxhash64(key).
    * Deterministic under any partitioning: fixed-seed hash, and the
    * partial-filter merge is a bitwise OR (commutative, associative). */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    Bridge.column(
      new BloomFilterAggregate(Bridge.expression(xxhash64(key)), expectedItems)
        .toAggregateExpression())

  /** Membership probe of `key` against the single-row bloom aggregate in
    * `bloomDf` (one binary column). The bloom side is injected as a
    * ScalarSubquery — BloomFilterMightContain requires a constant or
    * scalar subquery, and a subquery keeps the build distributed (no
    * driver collect at plan-construction time). */
  def mightContain(bloomDf: DataFrame, key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      Bridge.expression(xxhash64(key))))
}
