package graft.core

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** Typed facade mirroring hpmr's public surface (src/hpmr.h:1-10) over
  * Datasets — SURVEY §2.4. A "DistMap" here is simply a `Dataset[(K, V)]`
  * with distinct keys: the hash-partitioned Exchange that `groupByKey`
  * plans is the analog of hpmr's `hash % n_procs` routing
  * (src/dist_map.h:121-124), and typed aggregation runs the same
  * partial-combine → shuffle → final-combine phases as
  * async_set + sync (src/dist_map.h:118-130,147-210).
  *
  * Scale posture: every method is a lazy transformation on distributed
  * data; nothing but `get`/`count` touches the driver, and those return
  * scalars (a point lookup and a global count — the same collectives the
  * reference exposes, src/dist_map.h:90-96,132-145).
  */
object Graft {

  /** Any associative+commutative combine fn — hpmr's reducer contract
    * (src/dist_map.h:31-39). */
  type Reducer[V] = (V, V) => V

  /** hpmr mapper: one input pair emits 0..n output pairs
    * (src/dist_map.h:257-259, src/range.h:31). */
  type Mapper[K, V, KR, VR] = (K, V) => IterableOnce[(KR, VR)]

  /** Integer range source — `Range<T>(start, end, step)` (src/range.h:7-26). */
  def fromRange(spark: SparkSession, start: Long, end: Long, step: Long = 1L): Dataset[java.lang.Long] =
    spark.range(start, end, step)

  /** The shared shuffle-reduce tail of both mapreduce forms: hash-group
    * emitted pairs by key and merge values with `reducer` (partial
    * map-side combine comes from Spark's ReduceAggregator). */
  private def reduceByKey[KR, VR](pairs: Dataset[(KR, VR)], reducer: Reducer[VR])(
      implicit ekr: Encoder[(KR, VR)], ek: Encoder[KR]): Dataset[(KR, VR)] =
    pairs.groupByKey(_._1)
      .reduceGroups((a: (KR, VR), b: (KR, VR)) => (a._1, reducer(a._2, b._2)))
      .map { case (_, (k, v)) => (k, v) }

  /** The central operator: flat-map each pair through `mapper`, hash-shuffle
    * by the emitted key, merge values with `reducer`
    * (DistMap::mapreduce, src/dist_map.h:255-279). Spark plans map-side
    * partial reduction (ReduceAggregator partials) before the exchange,
    * matching hpmr's staging-map combine. */
  def mapreduce[K, V, KR, VR](in: Dataset[(K, V)], mapper: Mapper[K, V, KR, VR],
                              reducer: Reducer[VR])(
      implicit ekr: Encoder[(KR, VR)], ek: Encoder[KR]): Dataset[(KR, VR)] =
    reduceByKey(in.flatMap { case (k, v) => mapper(k, v) }, reducer)

  /** Range::mapreduce (src/range.h:28-64): the same shape with the range
    * source fused in. */
  def mapreduceRange[KR, VR](range: Dataset[java.lang.Long],
                             mapper: Long => IterableOnce[(KR, VR)],
                             reducer: Reducer[VR])(
      implicit ekr: Encoder[(KR, VR)], ek: Encoder[KR]): Dataset[(KR, VR)] =
    reduceByKey(range.flatMap((i: java.lang.Long) => mapper(i)), reducer)

  /** Buffered write with combine (DistMap::async_set,
    * src/dist_map.h:118-130): merge a batch of new pairs into the store,
    * resolving key collisions with `reducer`. */
  def put[K, V](store: Dataset[(K, V)], batch: Dataset[(K, V)], reducer: Reducer[V])(
      implicit ekv: Encoder[(K, V)], ek: Encoder[K]): Dataset[(K, V)] =
    mapreduce[K, V, K, V](store.union(batch), (k, v) => Iterator.single((k, v)), reducer)

  /** Key-equality filter for point ops. Fast path: a Column predicate
    * (`col("_1") === lit(key)`), which Catalyst pushes into the source
    * scan — on a parquet-backed store the lookup reads only row groups
    * whose min/max straddle the key instead of deserializing every row.
    * The fast path is taken ONLY for key types where SQL equality matches
    * Scala `==` (integral types, strings, booleans): floating-point keys
    * stay on the typed filter because SQL treats NaN = NaN as true while
    * `==` does not, and product-typed keys (hpmr's template contract)
    * cannot be `lit`-encoded at all. An allowlist beats try/catch — a
    * swallowed exception would silently degrade lookups to full scans. */
  private def keyFilter[K, V](store: Dataset[(K, V)], key: K): Dataset[(K, V)] =
    key match {
      case (_: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
            _: java.lang.Byte | _: String | _: java.lang.Boolean) =>
        store.filter(col("_1") === lit(key))
      case _ => store.filter((p: (K, V)) => p._1 == key)
    }

  /** Point lookup with default (DistMap::get, src/dist_map.h:132-145).
    * Driver-side scalar — the reference's MPI_Bcast collective collapses
    * to a filter + take(1) on the keyed store. */
  def get[K, V](store: Dataset[(K, V)], key: K, default: V): V =
    keyFilter(store, key).take(1)
      .headOption.map(_._2).getOrElse(default)

  /** Membership (`has`, src/bare_hash_container.h:181-196) for a single key. */
  def has[K, V](store: Dataset[(K, V)], key: K): Boolean =
    !keyFilter(store, key).isEmpty

  /** NaN keys can never match: SQL `<=>`/`=` treat NaN = NaN as TRUE
    * while the typed `==` of get/has (and the reference's C++ `==`, under
    * which a NaN key is unfindable in any hash container) treat it as
    * FALSE. Dropping NaN from the key SIDE makes the relational ops agree
    * with the point ops: a NaN key is never a member and never deletes. */
  private def dropNanKeys(keyDf: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    keyDf.schema("_k").dataType match {
      case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
        keyDf.filter(!isnan(col("_k")))
      case _ => keyDf
    }

  /** Set-membership as a relational op: keep pairs whose key appears in
    * `keys` (left-semi join — the distributed form of `has`). Keys wrap
    * in Tuple1 so product-typed keys stay a single struct column.
    * Null-safe equality (`<=>`): plain `===` evaluates to NULL for null
    * keys (or struct keys with a null field), silently never matching —
    * diverging from the typed `==` semantics of get/has. NaN keys are
    * excluded via [[dropNanKeys]] for the same consistency. */
  def hasAll[K, V](store: Dataset[(K, V)], keys: Dataset[K])(
      implicit ekv: Encoder[(K, V)], ek1: Encoder[Tuple1[K]]): Dataset[(K, V)] =
    store.join(dropNanKeys(keys.map(Tuple1(_)).select(col("_1").as("_k"))),
      col("_1") <=> col("_k"), "left_semi").as[(K, V)]

  /** Approximate distributed membership — [[hasAll]] at 100 TB: the key
    * set ships as a bloom-filter broadcast (graft.functions.Bloom, the
    * runtime-filter shape) and the STORE side is filtered map-side,
    * never shuffled. No false negatives ever; false positives at the
    * filter's capacity-contract rate, so compose `hasAll` on the
    * (already small) survivors when exactness matters — bloom pre-filter
    * + exact semi join is precisely what Spark's InjectRuntimeFilter
    * builds for selective joins. `expectedKeys` sizes the filter (~3%
    * FPP at capacity; overprovision for less). */
  def hasAllApprox[K, V](store: Dataset[(K, V)], keys: Dataset[K],
                         expectedKeys: Long = 1000000L)(
      implicit ek1: Encoder[Tuple1[K]]): Dataset[(K, V)] = {
    val keyDf = keys.map(Tuple1(_)).select(col("_1").as("_k"))
    val bloom = keyDf.agg(graft.functions.Bloom.bloomAgg(col("_k"), expectedKeys).as("bf"))
    store.filter(graft.functions.Bloom.mightContain(bloom, col("_1")))
  }

  /** Delete keys (`unset`, src/bare_hash_container.h:150-179) as a
    * left-anti join. Null-safe equality for the same reason as hasAll —
    * a null key must actually delete the null-keyed row; NaN keys delete
    * nothing, matching get/has reporting them absent. */
  def remove[K, V](store: Dataset[(K, V)], keys: Dataset[K])(
      implicit ekv: Encoder[(K, V)], ek1: Encoder[Tuple1[K]]): Dataset[(K, V)] =
    store.join(dropNanKeys(keys.map(Tuple1(_)).select(col("_1").as("_k"))),
      col("_1") <=> col("_k"), "left_anti").as[(K, V)]

  /** Set insert / dedup (HashSet::set, src/bare_set.h:34-52). */
  def distinctKeys[K, V](store: Dataset[(K, V)])(implicit ek: Encoder[K]): Dataset[K] =
    store.map(_._1).distinct()

  /** Global key count (get_n_keys, src/dist_map.h:90-96). Keys are unique
    * by construction in a keyed store, so this is a plain count. */
  def countKeys[K, V](store: Dataset[(K, V)]): Long = store.count()

  /** Pin a store in executor memory — the engine analog of holding the
    * hash table resident between queries (the reference's containers live
    * in RAM for their whole lifetime; a Dataset is recomputed per action
    * unless cached). */
  def cache[K, V](store: Dataset[(K, V)]): Dataset[(K, V)] = store.persist()

  /** `clear` (src/bare_hash_container.h:119-133): release the store's
    * materialized state. Blocking, so the memory is actually free when
    * this returns — matching the reference's immediate-deallocation
    * semantics. The Dataset remains usable (recomputed from source). */
  def clear[K, V](store: Dataset[(K, V)]): Dataset[(K, V)] =
    store.unpersist(blocking = true)

  /** `reserve` (src/bare_concurrent_container.h:22,94-97): pre-size the
    * engine for an expected key cardinality. The reference pre-allocates
    * hash buckets; the Spark analog is sizing the shuffle partition count
    * so post-shuffle partitions land near the per-task memory budget.
    * Heuristic: one partition per `keysPerPartition` expected keys.
    * NEVER SHRINKS the current setting — deliberately matching the
    * reference's reserve (and std::unordered_map::reserve), which only
    * grows capacity; callers wanting a lower width set the conf
    * directly. */
  def reserve(spark: SparkSession, expectedKeys: Long,
              keysPerPartition: Long = 4_000_000L): Int = {
    val current = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val target = math.max(current, ((expectedKeys + keysPerPartition - 1) / keysPerPartition).toInt)
    spark.conf.set("spark.sql.shuffle.partitions", target.toString)
    target
  }
}
