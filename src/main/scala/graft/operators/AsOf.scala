package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark has no native form
  * of, composed from built-ins per the preference order of SURVEY §7.3:
  * tag both sides, union, and carry the last quote value forward with a
  * running `last(ignoreNulls)` window — then keep only probe rows.
  *
  * Cost model: one union (no shuffle) + one hash exchange on the join key
  * + one in-partition sort — O(n log n) per key group, versus the O(n·m)
  * of the naive inequality join Spark would otherwise plan
  * (BroadcastNestedLoopJoin). At 100 TB the shuffle is the same exchange
  * a groupBy on the key would need; state never exceeds a partition sort.
  *
  * Tie semantics: at equal timestamps the quote sorts before the probe
  * (tag 0 < 1), making the match inclusive (probe_t >= quote_t) — the same
  * convention as DuckDB's ASOF JOIN, which the oracle uses. Callers must
  * ensure (key, time) is unique on the quote side (pre-aggregate
  * duplicates) or the carried value at a tied timestamp is plan-dependent.
  *
  * NULL quote values are dropped before the union (the running
  * last(ignoreNulls) could not distinguish them from "no quote yet"
  * anyway): the result is "latest non-null quote at or before t". This
  * differs from a native as-of join against a nullable value column —
  * which would match the null row and return null — so quote values
  * should be non-null by construction. NULL quote TIMESTAMPS are dropped
  * too: under ASC NULLS FIRST a null-t quote would sort before every row
  * and silently match every early probe, where a native as-of join
  * (probe_t >= NULL is never true) matches nothing. A null-t PROBE keeps
  * the native semantics for free: it sorts before all quotes, the
  * running last sees nothing, and the joined value is null.
  */
object AsOf {

  /** @param probes  (key, t, probeCols...)
    * @param quotes  (key, t, valueCol) — (key, t) must be unique
    * @return probes with `valueCol` = latest quote value at or before t
    */
  def asofJoin(probes: DataFrame, quotes: DataFrame, key: String, t: String,
               valueCol: String): DataFrame = {
    // Enforce the documented contract: a probe column named valueCol (or
    // either internal working column) would collide with an injected
    // column and surface later as an ambiguous-column plan error — fail
    // fast here instead.
    require(!probes.columns.contains(valueCol),
      s"probes already contains a column named '$valueCol' (the as-of output column)")
    for (reserved <- Seq("__tag", "__asof"))
      require(!probes.columns.contains(reserved),
        s"probes must not contain the reserved as-of working column '$reserved'")
    val probeCols = probes.columns.filter(c => c != key && c != t)
    val q = quotes.filter(col(valueCol).isNotNull && col(t).isNotNull)
      .select(col(key), col(t), lit(0).as("__tag"), col(valueCol))
    val p = probes.select(
      col(key) +: col(t) +: lit(1).as("__tag") +: probeCols.map(col): _*)
    val w = Window.partitionBy(key).orderBy(col(t), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // allowMissingColumns null-fills each side's absent columns with the
    // other side's type — the hand-built lit(null).cast(...) padding this
    // replaces had to mirror both schemas by hand.
    q.unionByName(p, allowMissingColumns = true)
      .withColumn("__asof", last(col(valueCol), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col(key) +: col(t) +: probeCols.map(col) :+ col("__asof").as(valueCol): _*)
  }
}
