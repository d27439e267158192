package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.multimodal.Multimodal
import graft.queries.{DedupQueries, ExtensionQueries, LinkageQueries, OlapQueries, ParityQueries, SamplingQueries, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY §2.3): hpmr parity
  * operators + LLM-data-pipeline extensions. Every entry has a DuckDB
  * oracle in `oracleSql` with identical column names and deterministic
  * ordering, so the driver's hash compare is exact.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full hpmr lifecycle in one plan: scan → partial agg → shuffle →
    * final agg (SURVEY §3.1 / §7.2). */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.mrSumByKey(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ ExtensionQueries.queries ++ OlapQueries.queries ++
      DedupQueries.queries ++ TextQueries.queries ++ SimilarityQueries.queries ++
      SamplingQueries.queries ++ LinkageQueries.queries ++ Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracles ++ ExtensionQueries.oracles ++ OlapQueries.oracles ++
      DedupQueries.oracles ++ TextQueries.oracles ++ SimilarityQueries.oracles ++
      SamplingQueries.oracles ++ LinkageQueries.oracles ++ Multimodal.oracles
}
