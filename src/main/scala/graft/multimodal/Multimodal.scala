package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing for a training-data pipeline.
  *
  * Media payloads are opaque `binary` columns with typed metadata. Decode
  * is REAL for the formats a pure JVM can decode (PNG/JPEG/BMP/GIF via
  * `javax.imageio`, WAV via a RIFF header walk — [[MediaDecode]], spec'd
  * on true encoded bytes in MultimodalSpec) and falls back to a clearly
  * marked deterministic derivation for payloads outside those formats —
  * which includes this environment's synthetic text-as-bytes corpus, so
  * the DuckDB oracle stays exact. Wider codecs (MP4, WebP, ...) would
  * bind a JNI/FFmpeg decoder behind the same `decode` signature and
  * change no plan shape: decode stays a `mapPartitions` over batches of
  * rows, exactly where a vectorized decode belongs.
  *
  * At 100 TB: payload bytes never shuffle — every operator here is either
  * a map-side projection/flatMap or aggregates only extracted metadata.
  * Partition sizing is governed by `spark.sql.files.maxPartitionBytes` on
  * the scan; decode parallelism is partition parallelism.
  */
object Multimodal {

  /** Typed media row: id, modality kind, payload, and source metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], n_chars: Long)

  /** Decoded-media features (stub decode output). */
  case class MediaFeatures(media_id: Long, kind: String, width: Int, height: Int,
                           channels: Int, n_bytes: Long)

  /** Deterministic media table derived from `documents`: the text payload
    * stands in for encoded media bytes; kind cycles image/audio/video. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      col("n_chars"))

  /** Media decode over the `mapPartitions` seam. Payloads whose bytes are
    * a format the JVM can really parse (PNG/JPEG/BMP/GIF pixel decode via
    * `javax.imageio`; WAV, WebP and MP4 container-header walks — see
    * [[MediaDecode]]) yield their TRUE geometry; anything else (notably
    * the synthetic text-as-bytes
    * fixture corpus) falls back to a deterministic derivation from payload
    * length so goldens and the DuckDB oracle stay exact. Swapping in a
    * wider decoder (JNI/FFmpeg) extends `MediaDecode.decode` and changes
    * no plan shape: decode stays one streaming pass per partition — the
    * batch shape a vectorized decoder needs, with payload bytes never
    * leaving their scan partition. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"), col("n_chars"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // Null payloads (null source text) are skipped, matching
        // frameSample's behavior where length(null) drops the row — the
        // two operators must not diverge (one crashing, one skipping).
        rows.filter(_.payload != null).map { r =>
          val n = r.payload.length.toLong
          MediaDecode.decode(r.payload) match {
            case Some(g) => MediaFeatures(r.media_id, r.kind, g.width, g.height, g.channels, n)
            case None =>
              // Deterministic fallback for undecodable payloads: derived
              // from payload size, not pixels (the honest label for the
              // synthetic corpus — a production ingest would instead
              // route these to a quarantine sink).
              val w = (n % 640 + 64).toInt
              val h = (n % 480 + 48).toInt
              val c = if (r.kind == "audio") 1 else 3
              MediaFeatures(r.media_id, r.kind, w, h, c, n)
          }
        }
      }
  }

  /** STUB resize: records the target geometry in metadata; a real kernel
    * would transform pixel data. Plan shape: pure projection. */
  def resizeStub(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): DataFrame =
    features.toDF().withColumn("scale",
        least(lit(maxW) / col("width"), lit(maxH) / col("height"), lit(1.0)))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))

  /** Frame sampling for video rows: emit one row per sampled frame
    * (1 frame per 100 "chars" of payload, at least 1) — a flatMap whose
    * fan-out is bounded per row; payload bytes are NOT duplicated per
    * frame (only ids/indices), which is what keeps this shuffle-safe at
    * scale. */
  def frameSample(media: DataFrame): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L),
          call_function("div", length(col("payload")).cast("long"), lit(100L)))).as("frame_idx"))

  /** Oracle-checkable plumbing query: per-kind payload stats. */
  def metaStats(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
           sum(length(col("payload")).cast("long")).as("total_bytes"),
           max(length(col("payload")).cast("long")).as("max_bytes"))
      .orderBy("kind")

  /** Oracle-checkable plumbing query: frames per video, ordered. */
  def frameCounts(s: SparkSession, d: String): DataFrame =
    frameSample(mediaTable(s, d))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"))
      .orderBy("media_id")

  /** Oracle-checkable DECODE+RESIZE query: the full pipeline —
    * mapPartitions decode → resize-geometry projection → per-kind exact
    * stats. This puts the mapPartitions decode seam itself under the
    * driver's DuckDB gate: on the synthetic corpus every payload takes
    * the deterministic fallback (arithmetic on payload length), so the
    * oracle reproduces the dimensions exactly; real encoded media takes
    * the true-decode path, spec'd separately in MultimodalSpec. */
  def resizeGeometry(s: SparkSession, d: String): DataFrame =
    resizeStub(decodeFeatures(mediaTable(s, d)), 256, 256)
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
           sum(col("out_w").cast("long")).as("sum_out_w"),
           sum(col("out_h").cast("long")).as("sum_out_h"),
           sum(when(col("scale") < 1.0, 1L).otherwise(0L)).as("n_downscaled"))
      .orderBy("kind")

  /** Exact media dedup by payload digest — the storage-savings estimator
    * a multimodal ingest runs first (identical images/clips re-posted
    * across sources are the dominant redundancy). Two-phase: group on
    * (kind, md5(payload)) so only 32-byte digests shuffle — payload bytes
    * stay in their scan partitions — then collapse per kind into row and
    * byte savings. dup_bytes = Σ (copies−1)·size: the bytes a
    * content-addressed store would not write. */
  def dedupPayload(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .filter(col("payload").isNotNull)
      .groupBy(col("kind"), md5(col("payload")).as("dg"))
      .agg(count(lit(1)).as("n"),
           max(length(col("payload"))).cast("long").as("bytes"))
      .groupBy("kind")
      .agg(sum(col("n")).as("n_payloads"),
           count(lit(1)).as("n_distinct"),
           sum((col("n") - 1L) * col("bytes")).as("dup_bytes"))
      .orderBy("kind")

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "mm_meta_stats" -> metaStats,
    "mm_frame_counts" -> frameCounts,
    "mm_resize_geometry" -> resizeGeometry,
    "mm_dedup_payload" -> dedupPayload,
  )

  val oracles: Map[String, String] = Map(
    "mm_meta_stats" ->
      """SELECT kind, COUNT(*) AS n,
        |       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
        |       MAX(octet_length(payload)) AS max_bytes
        |FROM (SELECT (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
        |             encode(text) AS payload
        |      FROM documents)
        |GROUP BY kind ORDER BY kind""".stripMargin,
    "mm_frame_counts" ->
      """SELECT media_id, COUNT(*) AS n_frames
        |FROM (SELECT doc_id AS media_id,
        |             UNNEST(generate_series(0, octet_length(encode(text)) // 100)) AS frame_idx
        |      FROM documents
        |      WHERE CAST(doc_id % 3 AS INT) = 2)
        |GROUP BY media_id ORDER BY media_id""".stripMargin,
    "mm_dedup_payload" ->
      """WITH grp AS (
        |  -- md5 over the VARCHAR: this DuckDB build's md5() rejects BLOB,
        |  -- and the payload IS the text's UTF-8 bytes, so the digests agree.
        |  SELECT kind, md5(text) AS dg, COUNT(*) AS n,
        |         MAX(octet_length(encode(text))) AS bytes
        |  FROM (SELECT (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
        |               text
        |        FROM documents)
        |  WHERE text IS NOT NULL
        |  GROUP BY kind, dg
        |)
        |SELECT kind, CAST(SUM(n) AS BIGINT) AS n_payloads,
        |       COUNT(*) AS n_distinct,
        |       CAST(SUM((n - 1) * bytes) AS BIGINT) AS dup_bytes
        |FROM grp GROUP BY kind ORDER BY kind""".stripMargin,
    // The fallback decode derives (w, h) from payload length (the whole
    // synthetic corpus is undecodable-as-media by construction); the
    // resize scale is one IEEE min-of-divisions, identical in both engines.
    "mm_resize_geometry" ->
      """WITH feat AS (
        |  SELECT (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
        |         octet_length(encode(text)) % 640 + 64 AS w,
        |         octet_length(encode(text)) % 480 + 48 AS h
        |  FROM documents WHERE text IS NOT NULL
        |), geo AS (
        |  SELECT kind, least(256 / w, 256 / h, 1.0) AS scale,
        |         CAST(floor(w * least(256 / w, 256 / h, 1.0)) AS INT) AS out_w,
        |         CAST(floor(h * least(256 / w, 256 / h, 1.0)) AS INT) AS out_h
        |  FROM feat
        |)
        |SELECT kind, COUNT(*) AS n,
        |       CAST(SUM(out_w) AS BIGINT) AS sum_out_w,
        |       CAST(SUM(out_h) AS BIGINT) AS sum_out_h,
        |       CAST(SUM(CASE WHEN scale < 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_downscaled
        |FROM geo GROUP BY kind ORDER BY kind""".stripMargin,
  )
}
