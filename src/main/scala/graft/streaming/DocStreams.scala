package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming form of the training-data ingestion pipeline —
  * the streaming counterpart of the batch `pipeline_clean_corpus` query:
  * documents arrive continuously (crawl output), and the engine gates,
  * dedups, and aggregates them incrementally instead of re-scanning the
  * corpus.
  *
  * Stage shapes and their scale posture:
  *   1. quality gate — stateless per-row projection/filter (identical
  *      tokenize + ratio logic to the batch form), map-side only;
  *   2. exact dedup on the md5 digest of normalized text, bounded by a
  *      watermark: state holds one 32-byte digest per UNIQUE recent doc,
  *      never the text, and ages out with event time (the streaming analog
  *      of the digest group-by — a plain dropDuplicates would grow state
  *      forever);
  *   3. per-language tumbling-window counts over the survivors, the
  *      monitoring signal an ingestion pipeline actually watches.
  *
  * Input schema: (doc_id LONG, lang STRING, text STRING, ingest_ts
  * TIMESTAMP). The transformation is source-agnostic: a MemoryStream in
  * specs, `readStream` (Kafka/files) in production, or a batch frame for
  * backfill — same plan.
  */
object DocStreams {

  /** Stage 1+2: quality gate then watermarked exact dedup. Exposed
    * separately so a sink can persist the clean corpus itself. */
  def cleanDocs(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("w", graft.functions.ColFns.words(col("text")))
      .filter(size(col("w")) >= 10)
      .filter(size(array_distinct(col("w"))) / size(col("w")).cast("double") >= 0.3)
      .withColumn("norm", graft.functions.ColFns.normDigest(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("norm")
      .select(col("doc_id"), col("lang"), col("ingest_ts"),
              size(col("w")).as("n_tokens"))

  /** Full pipeline: gate → dedup → per-(window, lang) doc/token counts.
    * Append mode emits each window once the watermark passes it. */
  def pipeline(docs: DataFrame, watermark: String = "1 hour",
               window_ : String = "1 hour"): DataFrame =
    cleanDocs(docs, watermark)
      .groupBy(window(col("ingest_ts"), window_), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens").cast("long")).as("n_tokens"))
      .select(col("window.start").as("window_start"), col("lang"),
              col("n_docs"), col("n_tokens"))
}
