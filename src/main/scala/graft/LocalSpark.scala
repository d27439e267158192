package graft

import org.apache.spark.sql.SparkSession

/** The ONE local-session builder both harness mains share — Verify
  * validates exactly what Bench times, so their sessions must stay
  * semantically identical (a conf added to one and not the other would
  * silently benchmark a different plan than the verified one).
  *
  *  - UTC session timezone: the timestamp-normalization contract of
  *    graft.sources.Tables requires it (non-UTC fails fast there).
  *  - nanosAsLong: legacy TIMESTAMP(NANOS) fixtures are unreadable in
  *    Spark 4 without it; a no-op for the current µs fixtures.
  *  - shuffle.partitions = cpus: local[N] has N cores; the 200-partition
  *    default just adds scheduling overhead at test scale.
  */
object LocalSpark {
  def session(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
