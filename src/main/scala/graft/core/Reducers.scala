package graft.core

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The hpmr combine-function library (reference src/reducer.h:7-23),
  * re-expressed as Spark aggregates.
  *
  * Built-ins map directly: `sum`/`min`/`max` are Catalyst aggregates with
  * partial (map-side) + final phases — the exact two-phase combine hpmr
  * performs at async_set (src/bare_map.h:55-56) and at sync merge
  * (src/dist_map.h:154-156,204).
  *
  * NOTE a deliberate divergence: the reference's `Reducer::min`/`max`
  * comparisons are swapped (src/reducer.h:16-22 — `min` keeps the LARGER
  * value); no reference test exercises them. We implement correct min/max
  * (SURVEY §1.3).
  *
  * `keep` (first-write-wins) and `overwrite` (last-write-wins,
  * src/reducer.h:10-12) are order-dependent under parallelism; the
  * deterministic declarations are `min_by`/`max_by` over an explicit
  * write-order column.
  */
object Reducers {
  def sum(c: Column): Column = org.apache.spark.sql.functions.sum(c)
  def min(c: Column): Column = org.apache.spark.sql.functions.min(c)
  def max(c: Column): Column = org.apache.spark.sql.functions.max(c)

  /** Deterministic Reducer::keep — value whose `order` column is smallest. */
  def keep(c: Column, order: Column): Column = min_by(c, order)

  /** Deterministic Reducer::overwrite — value whose `order` column is largest. */
  def overwrite(c: Column, order: Column): Column = max_by(c, order)

  /** Arbitrary user combine function as a typed Aggregator — the analog of
    * hpmr accepting any `std::function<void(V&, const V&)>` reducer
    * (src/dist_map.h:31-39). Spark runs it with partial aggregation, so
    * the user function must be associative+commutative, exactly as hpmr
    * requires for deterministic results. `zero` must be an identity of
    * `f`. */
  def reduceWith[V: Encoder](z: V, f: (V, V) => V): Aggregator[V, V, V] =
    new Aggregator[V, V, V] {
      override def zero: V = z
      override def reduce(b: V, a: V): V = f(b, a)
      override def merge(b1: V, b2: V): V = f(b1, b2)
      override def finish(r: V): V = r
      override def bufferEncoder: Encoder[V] = implicitly[Encoder[V]]
      override def outputEncoder: Encoder[V] = implicitly[Encoder[V]]
    }
}
