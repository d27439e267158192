package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table materialization — the one physical-layout lever for
  * fact-fact joins at 100 TB (DESIGN.md "co-located joins").
  *
  * A join of two tables bucketed (and sorted) on the join key by the SAME
  * bucket count plans as a SortMergeJoin with NO shuffle exchange on either
  * side: every bucket pair is read co-located, so the join cost is pure
  * streaming merge. At 100 TB the exchange this avoids is the single
  * biggest cost in a lineitem⋈orders-shaped query — the shuffle would move
  * the whole fact table across the cluster once per join. The reference
  * gets the same effect by construction (its DistMap permanently owns keys
  * hash-partitioned across ranks, /root/reference/src/dist_map.h:37-45);
  * bucketing is Spark's durable form of that ownership.
  *
  * Aggregations keyed on the bucket key also skip their exchange: the
  * partitioning reported by the scan already satisfies the distribution
  * requirement. BucketedJoinSpec asserts both properties on the physical
  * plan.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed AND sorted by `key`
    * into `n` buckets. Sorting inside buckets lets SortMergeJoin skip its
    * per-task sort as well. The repartition on the bucket key first is
    * load-bearing at scale: without it every input task writes its own
    * file for each bucket it happens to see (tasks × n small files — a
    * 10k-partition write with 1k buckets would emit ~10M files); with it,
    * one file per bucket. */
  def writeBucketed(df: DataFrame, key: String, n: Int, table: String): Unit =
    df.repartition(n, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(n, key).sortBy(key)
      .saveAsTable(table)
}
