package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ColFns.{md5Long, normDigest}
import graft.sources.Tables

/** Deterministic train/val/test split assignment and its contamination
  * audit — the corpus-carving stage of a training-data pipeline
  * (TextQueries carries the sibling sampling trio: rate, fixed-k, and
  * weighted). Both operators key decisions on a salted id-stable hash
  * (the [[ColFns.md5Long]] convention, pinned cross-engine in
  * FunctionsSpec) instead of `rand()`: re-running at any parallelism,
  * partitioning, or scale reproduces the identical assignment — the
  * property a 100 TB corpus rebuild needs, and what makes a DuckDB
  * oracle possible at all. The reference has no sampling surface; the
  * nearest analog is its bucket-level iteration (src/dist_hash_map.h
  * get_target_dist — hash-addressed placement), which is the same
  * hash-as-policy idea these queries apply to corpus membership.
  */
object SamplingQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Salt is versioned so a deliberate re-split changes every
    * assignment at once and an accidental drift changes none. */
  private val splitSalt = ":graft-split-v1"

  /** The single definition of the split rule — package-visible so specs
    * verify properties AGAINST it rather than re-deriving the salt/quota
    * arithmetic (which would silently diverge on a deliberate re-split).
    * Keyed on any expression: the id form below is the classic
    * assignment, [[sampleSplitByContent]] keys the SAME rule on the
    * normalized text digest. */
  private[graft] def splitKeyed(key: org.apache.spark.sql.Column) = {
    val bucket = pmod(md5Long(concat(key, lit(splitSalt))), lit(100L))
    when(bucket < 90L, "train").when(bucket < 95L, "val").otherwise("test")
  }

  private[graft] def splitCol(idCol: String) = splitKeyed(col(idCol))

  /** Hash-based train/val/test assignment (90/5/5) keyed on doc_id, with
    * per-(source, split) counts and token mass. Pure map-side hashing
    * into a 30-cell aggregate — no row ever shuffles, only partial
    * aggregates, so the plan is flat at any scale. Keying on the stable
    * id (not position or rand) means adding or removing OTHER documents
    * never moves an existing document across splits — the property that
    * keeps eval sets stable as the corpus grows. */
  val sampleSplitAssign: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("source"), col("n_chars"), splitCol("doc_id").as("split"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("source", "split")

  /** Split-leakage audit: exact-duplicate groups (the dedup family's
    * [[ColFns.normDigest]] equivalence) that span more than one split are
    * train/eval contamination — the test set is memorizable. Reports, per
    * source, the duplicated-group count, how many leak across splits, and
    * the number of documents sitting in a leaky group. Only 32-byte
    * digests and split labels shuffle (the dedup family's invariant:
    * text never moves); the group-level flags collapse in a second
    * partial-aggregated pass. */
  val splitLeakageAudit: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("source"), normDigest(col("text")).as("dg"),
              splitCol("doc_id").as("split"))
      .groupBy(col("source"), col("dg"))
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("split")).as("n_splits"))
      .groupBy("source")
      // Conditional sums rather than a pre-filter on duplicated groups: a
      // clean source must still REPORT (zeros), not vanish from the audit.
      .agg(sum(when(col("n_docs") > 1L, 1L).otherwise(0L)).as("n_dup_groups"),
           sum(when(col("n_docs") > 1L && col("n_splits") > 1L, 1L).otherwise(0L)).as("n_leaky_groups"),
           sum(when(col("n_docs") > 1L && col("n_splits") > 1L, col("n_docs")).otherwise(0L)).as("n_leaky_docs"))
      .orderBy("source")

  /** Content-keyed split assignment — the FIX for the contamination
    * [[splitLeakageAudit]] detects: the split key is the normalized text
    * digest (the dedup family's [[ColFns.normDigest]] equivalence)
    * instead of the doc id, so every member of an exact-duplicate group
    * lands in the SAME split by construction and train/eval leakage
    * through verbatim copies is impossible — the audit run against this
    * assignment reports zero leaky groups on ANY corpus
    * (SamplingSpec plants cross-source duplicates whose id-keyed
    * assignments straddle splits and pins both facts). Reports per
    * (source, split) document counts, distinct content groups, and
    * token mass. Same plan discipline as the audit: only 32-byte
    * digests and labels shuffle, count-distinct collapses through two
    * partial-agg levels, text never moves. */
  val sampleSplitByContent: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("source"), col("n_chars"), normDigest(col("text")).as("dg"))
      .withColumn("split", splitKeyed(col("dg")))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("dg")).as("n_groups"),
           sum(col("n_chars")).as("sum_chars"))
      .orderBy("source", "split")

  /** Salt for the temperature-mix admission hash — versioned separately
    * from the split salt so re-mixing never moves split membership. */
  private val mixSalt = ":graft-tmix-v1"

  /** α = 0.5 temperature-weighted source mixing — the standard LLM
    * data-mixing step: sampling mass p_s ∝ n_s^α flattens the source
    * distribution (big sources down-weighted, small sources kept near
    * verbatim), here with α = ½ and a 50 % total-token budget. All
    * arithmetic is engine-portable by construction: the per-source
    * weight is floor(sqrt(n_s)) (IEEE sqrt is correctly rounded, floor
    * exact), global sums are integer, and the final acceptance rate
    * becomes a 32-bit integer threshold compared against the salted
    * id-stable [[ColFns.md5Long]] hash — per-document admission is one
    * map-side compare, so the mix is reproducible at any parallelism
    * and a document's fate never depends on scan order. Plan: one
    * column-pruned pass for per-source counts (tiny aggregate →
    * broadcast back), one pass for admission — no corpus-sized shuffle
    * anywhere. */
  val sampleTemperatureMix: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val stats = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    val globals = stats.agg(sum(col("w")).as("sw"), sum(col("n_docs")).as("total"))
    val rate = least(lit(1.0d),
      (call_function("div", col("total"), lit(2L)).cast("double") * col("w").cast("double")) /
        (col("sw").cast("double") * col("n_docs").cast("double")))
    val thr = stats.crossJoin(broadcast(globals))
      .withColumn("thr", floor(lit(4294967296.0d) * rate).cast("long"))
      .select("source", "n_docs", "w", "thr")
    docs.select(col("source"), col("n_chars"),
        md5Long(concat(col("doc_id"), lit(mixSalt))).as("u"))
      .join(broadcast(thr), "source")
      .groupBy("source", "n_docs", "w", "thr")
      .agg(sum(when(col("u") < col("thr"), 1L).otherwise(0L)).as("n_kept"),
           sum(when(col("u") < col("thr"), col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy("source")
  }

  /** Feature-hash width for [[sampleDsirWeights]] — bounded by
    * construction, so the per-feature statistics table is ≤ 2·[[DsirB]]
    * rows at ANY corpus size (the property that keeps the scoring join
    * broadcast-eligible forever). */
  private[graft] val DsirB = 1024L

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * via Importance Resampling"): score each non-target document by how
    * much its hashed token features look like the TARGET domain (here
    * lang = 'en' — any predicate works) versus the rest of the raw
    * pool. The engine-exact, log-free form: instead of the paper's
    * Σ log(p_tgt(f)/p_src(f)) (libm log would break the oracle hash),
    * each token VOTES sign(p_tgt(f) − p_src(f)) and the document score
    * is the mean vote in [−1, 1] — the sign of the log-ratio, summed,
    * which preserves the ranking signal selection needs. The rates are
    * IEEE doubles (long→double exact below 2⁵³, division correctly
    * rounded, so both engines compare bit-identical results) rather
    * than cross-multiplied integers, which would overflow int64 once
    * cf·N crosses 2⁶³ (~3·10⁹ tokens per side — real corpora pass that).
    *
    * Scale shape: the feature table is the [[DsirB]]-bucket hashed
    * vocabulary — ONE map-side-combined aggregate collapses the token
    * stream to ≤ DsirB rows (partial aggregation bounds per-partition
    * output at DsirB cells, the async_set/combine discipline), and that
    * collapsed `stats` frame IS snapshotted (round-12 verdict #2): it
    * has TWO readers (the scoring join and `totals`), and un-snapshotted
    * each reader re-ran the full corpus scan+tokenize+hash pipeline —
    * three document scans for a query whose stats fit in ~2 KB. The
    * `termDocTf`/BM25 multi-read rule, applied: snapshot the ≤ 2·DsirB-row
    * COLLAPSED table, never the exploded token stream (materializing the
    * stream costs more than its one remaining scan — the
    * text_decontaminate measurement, TextQueries.scala). The plan now
    * scans documents.parquet exactly twice: once to build `stats`, once
    * to score. `totals` is one scalar row, and scoring is the token
    * stream against the bounded stats table followed by one per-doc
    * aggregate. The scoring join PINS broadcast(stats): the snapshot's
    * LogicalRDD carries no size estimate the static planner trusts, and
    * left unforced the fixture-scale planner elected the OTHER side —
    * it broadcast the pool token stream (Catalyst estimates the exploded
    * stream tiny at small file sizes), the exact corpus-growing
    * broadcast the 100 TB rule forbids. The stats side is ≤ 2·DsirB rows
    * at ANY corpus size by the pmod grouping, so forcing it is
    * scale-invariant sane rather than scale-adaptive (BroadcastGuardSpec
    * allowlists the hint with this bound; VolumeProbe's dsir entry
    * records the executed join side at both arms). */
  val sampleDsirWeights: Q = (s, d) => {
    import graft.functions.ColFns.{md5Long60, words}
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), (col("lang") === "en").as("tgt"),
        explode(words(col("text"))).as("w"))
      .select(col("doc_id"), col("tgt"),
        pmod(md5Long60(col("w")), lit(DsirB)).as("f"))
    val stats = org.apache.spark.sql.graftx.Sessions.snapshot(
      toks.groupBy("f")
        .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("cf_tgt"),
             sum(when(!col("tgt"), 1L).otherwise(0L)).as("cf_src")))._2
    val totals = stats.agg(sum(col("cf_tgt")).as("n_tgt"),
                           sum(col("cf_src")).as("n_src"))
    val pTgt = col("cf_tgt").cast("double") / col("n_tgt").cast("double")
    val pSrc = col("cf_src").cast("double") / col("n_src").cast("double")
    val vote = when(pTgt > pSrc, 1L).when(pTgt < pSrc, -1L).otherwise(0L)
    toks.filter(!col("tgt"))
      .join(broadcast(stats), "f")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), vote.as("v"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("v")).as("votes"))
      .select(col("doc_id"), col("n_feats"), col("votes"),
        round(col("votes").cast("double") / col("n_feats").cast("double"), 6)
          .as("dsir_score"))
      .orderBy("doc_id")
  }

  /** Salt for the UniMax fractional-epoch admission hash — versioned
    * separately (the mixSalt doctrine: re-allocating never moves split
    * or mix membership). */
  private val unimaxSalt = ":graft-unimax-v1"

  /** UniMax's per-language epoch cap E — no language is repeated more
    * than E times however small it is (the paper's overfitting guard). */
  private[graft] val UnimaxEpochCap = 2L

  /** UniMax language-balanced budget allocation (Chung et al. 2023,
    * "UniMax: Fairer and More Effective Language Sampling for
    * Large-Scale Multilingual Pretraining", ICLR): given a total
    * character budget B (half the corpus, the [[sampleTemperatureMix]]
    * dial) and an epoch cap E = [[UnimaxEpochCap]], allocate greedily —
    * smallest languages first, each language getting min(E·n_l, its
    * even share of what remains). Temperature sampling
    * ([[sampleTemperatureMix]]) flattens by a power; UniMax instead
    * WATERFILLS: every language that fits under the water line θ gets
    * its full E epochs, the rest get exactly θ characters each. The
    * paper's sequential greedy loop has a closed form this query
    * computes with window functions over the per-language stats table:
    * sort by cap_l = E·n_l ascending, m = the largest prefix where
    * cap_i·(L−i+1) + Σ_{j<i} cap_j ≤ B (the feasibility predicate is
    * monotone in i — (L−i)·(cap_{i+1}−cap_i) ≥ 0 — so the prefix count
    * IS the max), θ = (B − Σ_{j≤m} cap_j) ⫽ (L−m), allocation
    * a_i = cap_i for i ≤ m else θ. All exact integer arithmetic
    * ([[graft.functions.ColFns.floorDiv]]); θ's floor remainder
    * (< L−m chars) is deliberately unallocated. Since Σcap = E·T > B,
    * position L is never feasible and L−m ≥ 1 — the floorDiv positivity
    * guard cannot fire. Outputs per language: the allocation, whole
    * epochs a_l ⫽ n_l, the exact epoch ratio (one double division,
    * round 6), and the fractional-epoch admission leg — documents
    * hash-admitted at threshold ⌊2³²·(a_l mod n_l)/n_l⌋ against the
    * salted id-stable [[graft.functions.ColFns.md5Long]], the
    * temperature-mix convention (integer cross-multiplying the
    * threshold would overflow int64 at 2³²·n_chars for any language
    * over ~4 GB of text, so the rate is the one correctly-rounded
    * double both engines agree on).
    *
    * Scale shape: the stats table is one column-pruned map-side-combined
    * aggregate (|languages| rows — bounded enumeration); every window
    * runs over THAT table (never the corpus — row_number/cumsum over ≤ a
    * few hundred rows on one task is the point of the closed form);
    * admission is one broadcast equi-join on lang + one map-side
    * compare, so the corpus pays two column-pruned scans and zero
    * corpus-scale shuffles — the temperature-mix plan shape with a
    * waterfilled threshold table. */
  val sampleUnimax: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.ColFns.floorDiv
    val docs = Tables.documents(s, d)
    val stats = docs.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .withColumn("cap", lit(UnimaxEpochCap) * col("n_chars"))
    val ordW = Window.orderBy(col("cap"), col("lang"))
    val allW = Window.partitionBy()
    val g = stats
      .withColumn("rn", row_number().over(ordW).cast("long"))
      .withColumn("cum", sum(col("cap")).over(ordW))
      .withColumn("nl", count(lit(1)).over(allW))
      .withColumn("budget", floorDiv(sum(col("n_chars")).over(allW), 2L))
      .withColumn("feasible",
        col("cap") * (col("nl") - col("rn") + 1L) +
          (col("cum") - col("cap")) <= col("budget"))
      .withColumn("m", sum(when(col("feasible"), 1L).otherwise(0L)).over(allW))
      .withColumn("pm", max(when(col("feasible"), col("cum")).otherwise(0L)).over(allW))
    val alloc = g.select(col("lang"), col("n_docs"), col("n_chars"),
        col("cap").as("cap_chars"),
        when(col("rn") <= col("m"), col("cap"))
          .otherwise(floorDiv(col("budget") - col("pm"), col("nl") - col("m")))
          .as("alloc_chars"))
      .withColumn("full_epochs", floorDiv(col("alloc_chars"), col("n_chars")))
      .withColumn("epochs",
        round(col("alloc_chars").cast("double") / col("n_chars").cast("double"), 6))
      .withColumn("thr", floor(lit(4294967296.0d) *
        ((col("alloc_chars") - col("full_epochs") * col("n_chars")).cast("double") /
          col("n_chars").cast("double"))).cast("long"))
    docs.select(col("lang"), col("n_chars").as("dc"),
        md5Long(concat(col("doc_id"), lit(unimaxSalt))).as("u"))
      .join(broadcast(alloc), "lang")
      .groupBy("lang", "n_docs", "n_chars", "cap_chars", "alloc_chars",
               "full_epochs", "epochs")
      .agg(sum(when(col("u") < col("thr"), 1L).otherwise(0L)).as("n_part_docs"),
           sum(when(col("u") < col("thr"), col("dc")).otherwise(0L)).as("part_chars"))
      .orderBy("lang")
  }

  val queries: Map[String, Q] = Map(
    "sample_split_assign" -> sampleSplitAssign,
    "sample_split_by_content" -> sampleSplitByContent,
    "split_leakage_audit" -> splitLeakageAudit,
    "sample_temperature_mix" -> sampleTemperatureMix,
    "sample_dsir_weights" -> sampleDsirWeights,
    "sample_unimax" -> sampleUnimax,
  )

  // DuckDB mirrors. md5Long convention: CAST('0x' || substring(md5(x),1,8)
  // AS BIGINT) — non-negative 32-bit, so % 100 agrees without pmod care.
  private val splitSqlExpr =
    s"""CASE WHEN CAST('0x' || substring(md5(doc_id || '$splitSalt'), 1, 8) AS BIGINT) % 100 < 90 THEN 'train'
       |     WHEN CAST('0x' || substring(md5(doc_id || '$splitSalt'), 1, 8) AS BIGINT) % 100 < 95 THEN 'val'
       |     ELSE 'test' END""".stripMargin

  val oracles: Map[String, String] = Map(
    "sample_split_assign" ->
      s"""SELECT source, split, COUNT(*) AS n_docs,
         |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM (SELECT source, n_chars, $splitSqlExpr AS split FROM documents)
         |GROUP BY source, split ORDER BY source, split""".stripMargin,
    "sample_split_by_content" ->
      s"""SELECT source, split, COUNT(*) AS n_docs,
         |       CAST(COUNT(DISTINCT dg) AS BIGINT) AS n_groups,
         |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM (
         |  SELECT source, n_chars, dg,
         |         CASE WHEN CAST('0x' || substring(md5(dg || '$splitSalt'), 1, 8) AS BIGINT) % 100 < 90 THEN 'train'
         |              WHEN CAST('0x' || substring(md5(dg || '$splitSalt'), 1, 8) AS BIGINT) % 100 < 95 THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM (SELECT source, n_chars, md5(lower(trim(text))) AS dg
         |        FROM documents WHERE text IS NOT NULL)
         |)
         |GROUP BY source, split ORDER BY source, split""".stripMargin,
    "split_leakage_audit" ->
      s"""WITH grp AS (
         |  SELECT source, md5(lower(trim(text))) AS dg, COUNT(*) AS n_docs,
         |         COUNT(DISTINCT $splitSqlExpr) AS n_splits
         |  FROM documents WHERE text IS NOT NULL
         |  GROUP BY source, dg
         |)
         |SELECT source,
         |       CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
         |       CAST(SUM(CASE WHEN n_docs > 1 AND n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_groups,
         |       CAST(SUM(CASE WHEN n_docs > 1 AND n_splits > 1 THEN n_docs ELSE 0 END) AS BIGINT) AS n_leaky_docs
         |FROM grp GROUP BY source ORDER BY source""".stripMargin,
    "sample_temperature_mix" ->
      s"""WITH stats AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |         CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w
         |  FROM documents GROUP BY source
         |), g AS (
         |  SELECT CAST(SUM(w) AS BIGINT) AS sw,
         |         CAST(SUM(n_docs) AS BIGINT) AS total
         |  FROM stats
         |), thr AS (
         |  SELECT source, n_docs, w,
         |         CAST(FLOOR(4294967296.0 * LEAST(1.0,
         |           (CAST(total // 2 AS DOUBLE) * CAST(w AS DOUBLE)) /
         |           (CAST(sw AS DOUBLE) * CAST(n_docs AS DOUBLE)))) AS BIGINT) AS thr
         |  FROM stats, g
         |)
         |SELECT t.source, t.n_docs, t.w, t.thr,
         |       CAST(SUM(CASE WHEN doc.u < t.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(SUM(CASE WHEN doc.u < t.thr THEN doc.n_chars ELSE 0 END) AS BIGINT) AS kept_chars
         |FROM (SELECT source, n_chars,
         |             CAST('0x' || substring(md5(doc_id || '$mixSalt'), 1, 8) AS BIGINT) AS u
         |      FROM documents) doc
         |JOIN thr t ON t.source = doc.source
         |GROUP BY t.source, t.n_docs, t.w, t.thr
         |ORDER BY t.source""".stripMargin,
    "sample_dsir_weights" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang = 'en' AS tgt,
         |         CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) % $DsirB AS f
         |  FROM (SELECT doc_id, lang,
         |               UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS w
         |        FROM documents)
         |), stats AS (
         |  SELECT f,
         |         CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS cf_tgt,
         |         CAST(SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS BIGINT) AS cf_src
         |  FROM toks GROUP BY f
         |), tot AS (
         |  SELECT CAST(SUM(cf_tgt) AS BIGINT) AS n_tgt,
         |         CAST(SUM(cf_src) AS BIGINT) AS n_src FROM stats
         |), voted AS (
         |  SELECT doc_id,
         |         CASE WHEN CAST(cf_tgt AS DOUBLE) / CAST(n_tgt AS DOUBLE) >
         |                   CAST(cf_src AS DOUBLE) / CAST(n_src AS DOUBLE) THEN 1
         |              WHEN CAST(cf_tgt AS DOUBLE) / CAST(n_tgt AS DOUBLE) <
         |                   CAST(cf_src AS DOUBLE) / CAST(n_src AS DOUBLE) THEN -1
         |              ELSE 0 END AS v
         |  FROM toks JOIN stats USING (f) CROSS JOIN tot
         |  WHERE NOT tgt
         |)
         |SELECT doc_id, COUNT(*) AS n_feats, CAST(SUM(v) AS BIGINT) AS votes,
         |       round(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS dsir_score
         |FROM voted GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "sample_unimax" ->
      s"""WITH stats AS (
         |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         |         CAST($UnimaxEpochCap * SUM(n_chars) AS BIGINT) AS cap
         |  FROM documents GROUP BY lang
         |), w AS (
         |  SELECT lang, n_docs, n_chars, cap,
         |         CAST(ROW_NUMBER() OVER (ORDER BY cap, lang) AS BIGINT) AS rn,
         |         CAST(SUM(cap) OVER (ORDER BY cap, lang) AS BIGINT) AS cum,
         |         CAST(COUNT(*) OVER () AS BIGINT) AS nl,
         |         CAST(SUM(n_chars) OVER () AS BIGINT) // 2 AS budget
         |  FROM stats
         |), f AS (
         |  SELECT *, (cap * (nl - rn + 1) + (cum - cap) <= budget) AS feasible
         |  FROM w
         |), g AS (
         |  SELECT *,
         |         CAST(SUM(CASE WHEN feasible THEN 1 ELSE 0 END) OVER () AS BIGINT) AS m,
         |         CAST(MAX(CASE WHEN feasible THEN cum ELSE 0 END) OVER () AS BIGINT) AS pm
         |  FROM f
         |), alloc AS (
         |  SELECT lang, n_docs, n_chars, cap AS cap_chars,
         |         CAST(CASE WHEN rn <= m THEN cap
         |                   ELSE (budget - pm) // (nl - m) END AS BIGINT) AS alloc_chars
         |  FROM g
         |), e AS (
         |  SELECT lang, n_docs, n_chars, cap_chars, alloc_chars,
         |         CAST(alloc_chars // n_chars AS BIGINT) AS full_epochs,
         |         round(CAST(alloc_chars AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS epochs,
         |         CAST(FLOOR(4294967296.0 *
         |           (CAST(alloc_chars - (alloc_chars // n_chars) * n_chars AS DOUBLE) /
         |            CAST(n_chars AS DOUBLE))) AS BIGINT) AS thr
         |  FROM alloc
         |)
         |SELECT e.lang, e.n_docs, e.n_chars, e.cap_chars, e.alloc_chars,
         |       e.full_epochs, e.epochs,
         |       CAST(SUM(CASE WHEN doc.u < e.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_part_docs,
         |       CAST(SUM(CASE WHEN doc.u < e.thr THEN doc.n_chars ELSE 0 END) AS BIGINT) AS part_chars
         |FROM (SELECT lang, n_chars,
         |             CAST('0x' || substring(md5(doc_id || '$unimaxSalt'), 1, 8) AS BIGINT) AS u
         |      FROM documents) doc
         |JOIN e ON e.lang = doc.lang
         |GROUP BY 1, 2, 3, 4, 5, 6, 7
         |ORDER BY e.lang""".stripMargin,
  )
}
