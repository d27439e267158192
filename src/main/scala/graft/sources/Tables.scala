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

  /** The engine-wide `events.ts` contract is `long` nanoseconds since epoch:
    * every time computation downstream is pure integer arithmetic —
    * deterministic and identical to the DuckDB oracle's `epoch()`/`epoch_us()`
    * on its TIMESTAMP. The *physical* parquet encoding is the fixture
    * producer's choice and has drifted before (TIMESTAMP(NANOS) through
    * round 7, `timestamp[us]` from round 8), so [[events]] normalizes
    * whatever arrives to that contract instead of assuming an encoding. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  /** Date-typed columns normalize to TIMESTAMP_NTZ: the fixtures ship
    * tz-naive timestamp[us] today, and a producer flipping the
    * isAdjustedToUTC bit (read as TIMESTAMP under a UTC session) must not
    * change any query result — the cast is exact under the forced UTC
    * session timezone, same policy as [[events]]' nanos contract. */
  private def tsToNtz(s: SparkSession, df: DataFrame, cols: String*): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    cols.foldLeft(df) { (acc, c) =>
      acc.schema(c).dataType match {
        case TimestampType =>
          // Same precondition as events(): under any non-UTC session the
          // cast renders local wall-clock and silently shifts every
          // timestamp — fail fast instead.
          require(isUtc(s.conf.get("spark.sql.session.timeZone")),
            s"Tables requires a UTC session timezone to normalize $c " +
              "(TIMESTAMP -> TIMESTAMP_NTZ) exactly; found " +
              s.conf.get("spark.sql.session.timeZone"))
          acc.withColumn(c, col(c).cast(TimestampNTZType))
        case _ => acc
      }
    }
  }

  def orders(s: SparkSession, d: String): DataFrame =
    tsToNtz(s, table(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    tsToNtz(s, table(s, d, "lineitem"), "l_shipdate")
  /** True iff the zone id denotes fixed UTC (accepts "UTC", "Etc/UTC",
    * "GMT", "Z", "+00:00", ... — string equality against "UTC" would
    * hard-fail caller-built sessions on machines whose default zone id is
    * an equivalent spelling). */
  private def isUtc(tz: String): Boolean =
    try java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
    catch { case _: java.time.DateTimeException => false }

  /** Events with `ts` normalized to long nanos since epoch (see [[table]]'s
    * contract note). Handles every parquet encoding the fixture has shipped:
    *
    *   - `LongType`: TIMESTAMP(NANOS) read under
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (the session builders
    *     still set the flag so a legacy nanos fixture stays readable at all) —
    *     already the contract, pass through.
    *   - `TimestampType` / `TimestampNTZType`: µs-precision parquet
    *     timestamps (`timestamp[us]`, TZ-adjusted or not). The session
    *     timezone is forced to UTC in every builder, so casting NTZ through
    *     `timestamp` is exact; `unix_micros * 1000` recovers integer nanos
    *     losslessly (µs precision ⊂ ns).
    *
    * Anything else fails fast with the found schema rather than surfacing as
    * scattered DATATYPE_MISMATCH analysis errors in each downstream query.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // Best-effort self-heal for legacy TIMESTAMP(NANOS) fixtures: without
    // the flag the SCAN itself throws PARQUET_TYPE_ILLEGAL before the
    // type match below could ever see a LongType arm. Harmless for µs
    // fixtures (the flag only affects NANOS columns), so set it
    // unconditionally rather than requiring every caller-built session
    // to know about an encoding the fixture may no longer even use.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType | TimestampNTZType =>
        require(isUtc(s.conf.get("spark.sql.session.timeZone")),
          "Tables.events requires a UTC session timezone to normalize " +
            "a TIMESTAMP/TIMESTAMP_NTZ ts column exactly; found " +
            s.conf.get("spark.sql.session.timeZone"))
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other => throw new IllegalStateException(
        s"events.ts at $d has unsupported type $other; expected long nanos, " +
          s"TIMESTAMP or TIMESTAMP_NTZ. Full schema: ${df.schema.treeString}")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
