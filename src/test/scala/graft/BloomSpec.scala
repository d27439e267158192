package graft

import graft.functions.Bloom
import org.apache.spark.sql.functions._

/** Contract tests for the bloom membership operator (the declared
  * `bloom_membership` query asserts the same contracts on real tables;
  * this spec drives the operator directly on adversarial shapes).
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom never false-negatives, any partitioning (merge is OR)") {
    for (parts <- Seq(1, 7)) {
      val keys = (0L until 5000L).map(_ * 37L)
      val keyDf = keys.toDF("k").repartition(parts)
      val bloom = keyDf.agg(Bloom.bloomAgg(col("k"), 100000L).as("bf"))
      val misses = keyDf
        .withColumn("hit", Bloom.mightContain(bloom, col("k")))
        .filter(!col("hit")).count()
      assert(misses == 0L, s"false negatives at $parts partitions")
    }
  }

  test("false-positive rate stays within the capacity contract") {
    val members = (0L until 2000L).toDF("k")
    val bloom = members.agg(Bloom.bloomAgg(col("k"), 100000L).as("bf"))
    // 20k probes guaranteed disjoint from the member range
    val probes = (1000000L until 1020000L).toDF("k")
    val fp = probes.withColumn("hit", Bloom.mightContain(bloom, col("k")))
      .filter(col("hit")).count()
    // capacity 100k holding 2k keys: FPP far below the 3%-at-capacity
    // design point; 1% gives margin without flakiness (bits are
    // deterministic, so this is a fixed number, not a random draw)
    assert(fp <= 200L, s"$fp false positives out of 20000 probes")
  }

  test("facade hasAllApprox is a superset of exact hasAll; composition is exact") {
    import graft.core.Graft
    val store = (0L until 4000L).map(k => (k, k * 2)).toDS()
    val keys = (0L until 4000L by 9L).toDS()
    val exact = Graft.hasAll(store, keys).collect().toSet
    val approx = Graft.hasAllApprox(store, keys, expectedKeys = 100000L)
    val approxSet = approx.collect().toSet
    assert(exact.subsetOf(approxSet), "bloom must never drop a true member")
    // bloom pre-filter composed with the exact semi join = exact result
    assert(Graft.hasAll(approx, keys).collect().toSet == exact)
  }

  test("bloom bits are identical across partitionings (deterministic build)") {
    val keys = (0L until 3000L).map(_ * 13L)
    def bits(parts: Int): Seq[Byte] =
      keys.toDF("k").repartition(parts)
        .agg(Bloom.bloomAgg(col("k"), 50000L).as("bf"))
        .head().getAs[Array[Byte]]("bf").toSeq
    assert(bits(1) == bits(5))
  }
}
