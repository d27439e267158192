package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table sources over the driver-generated parquet fixtures.
  *
  * The reference (jl2922/hpmr) has no file I/O at all — its only sources are
  * an integer `Range` (src/range.h:7-26) and in-memory maps. Our engine's
  * sources are the parquet star schema plus `spark.range`; parquet scans give
  * column pruning + predicate pushdown for free, which matters at 100 TB
  * (only the referenced columns of a scan are read; see `.explain` ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark 4 only reads via
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in all session
    * builders); the column arrives as `long` nanoseconds since epoch, which
    * keeps every time computation pure integer arithmetic — deterministic
    * and identical to the DuckDB oracle's `epoch()` on its µs-truncated
    * TIMESTAMP. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  private val nanosFlagNoted = new java.util.concurrent.atomic.AtomicBoolean(false)

  def events(s: SparkSession, d: String): DataFrame = {
    // Defensive: a caller-supplied session without the flag would fail the
    // scan with PARQUET_TYPE_ILLEGAL; it is a runtime SQL conf, so set it
    // here rather than requiring every session builder to know. This is a
    // session-wide side effect by design — Spark 4 cannot read NANOS
    // parquet as TIMESTAMP at all, so no caller loses a capability; any
    // nanos column in the session simply reads as long nanos. When the
    // override actually changes a foreign session's conf, say so once in
    // the log so the surprise is at least visible (round-2 advice).
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true"
        && nanosFlagNoted.compareAndSet(false, true))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "graft Tables.events is setting spark.sql.legacy.parquet.nanosAsLong=true " +
          "session-wide: events.ts is parquet TIMESTAMP(NANOS), unreadable in " +
          "Spark 4 without it; nanos columns in this session now read as BIGINT nanos.")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
