package graft

import java.nio.file.Files

import graft.queries.{DedupQueries, SimilarityQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{Metrics, Sessions}

/** One-shot 100× VOLUME probe for the heavy plan classes
  * (VERDICT r4 #5 / r5 next #3 / r6 next #1): the dedup composition
  * (minhash-capped candidates → jaccard-on-lsh rescoring → raw
  * connected-component labels), the span profiling/removal pair, and —
  * new in round 7 — the EMBEDDING family (the bucket self-join feeding a
  * rank window in `sim_knn_graph`, and the sign-LSH blocked
  * `dedup_embedding_pairs`), measured at 1× and SPARK_GRAFT_VOL_FACTOR×
  * (default 100×) the sf0.1 corpus. The embedding entries exercise the
  * documented planes-track-log₂(n) deployment rule at the probe factor:
  * ⌈log₂ factor⌉ extra hyperplanes hold bucket occupancy ≈ the candidate
  * budget — and for the pairs query, whose TABLE count also grows for
  * recall, plane growth absorbs the table growth too (2^k tracks L·n;
  * see the fixed-point computation below). RecallSpec pins every grown
  * form recall-safe: kNN at k = 10 and 13, pairs at (8,3) and (12,5).
  *
  * ScaleProbeSpec's 10× gate runs every build; this main exists because a
  * single 100× point is the strongest linearity evidence this host can
  * produce — IF the gate is host-noise-free. So only the VOLUME gate from
  * ScaleProbeSpec applies here: shuffle-records-read ratio ≤ 2× linear
  * (≤ 2·factor), join-output rows ≤ 2× linear (the round-7 fourth arm —
  * a hash-join quadratic collapsed into a same-stage aggregate shuffles
  * nothing, but its join nodes' numOutputRows counts every pair), disk
  * spill bounded, and no nested-loop join in any EXECUTED plan (checked
  * structurally on the final adaptive plan — round-6 ADVICE: the
  * pre-execution sparkPlan cannot show an AQE runtime re-plan). Record
  * counts, join-row counts and plan shape are properties of the PLAN,
  * not the VM — this box's documented stall episodes inflate wall 10-30×
  * and even thread-CPU time (memory stalls are on-CPU), which is exactly
  * why wall/cpu are RECORDED in the artifact for context but never gated
  * on.
  *
  * The 100× corpus uses the same per-copy word salting as ScaleProbeSpec
  * (offset doc_ids, every word tagged per copy): intra-copy near-dup
  * structure is preserved exactly while cross-copy shingle collisions are
  * impossible, so candidate volume grows ~factor×, not factor²× as naive
  * duplication would force on a perfectly linear operator. Embeddings get
  * the analogous treatment: a per-copy ±1 DIAGONAL (deterministic
  * per-(copy, dim) sign flip) is orthogonal, preserving intra-copy
  * cosines exactly while scrambling cross-copy sign-LSH buckets.
  *
  * Auto-broadcast is DISABLED for the probe session: the first run of
  * this probe failed its own gate at 274×/360× "growth" on
  * minhash-capped and clusters because the unhinted band-table self-join
  * BROADCASTS at 1× (zero shuffle records on the join sides) and crosses
  * to a real shuffle join at 100× — a plan-class transition, not
  * quadratic work (jaccard-on-lsh, whose joins pin SHUFFLE_HASH and so
  * keep one plan class, measured 117.8× ≈ linear on the very same run).
  * At the actual target scale nothing in these pipelines broadcasts, so
  * forcing the shuffle-join class at BOTH scales is the honest baseline:
  * the gate then measures how shuffle volume SCALES, not where the
  * broadcast threshold happens to sit. Explicit broadcast() hints (the
  * tiny scalar/size tables) still broadcast — hints override the
  * threshold — which is also their posture at 100 TB.
  *
  * The record/join floors (a flat 10k-record 1× baseline minimum) exist
  * so a near-zero 1× denominator can't flake the gate — but they also
  * mean a passing entry can ride the floor rather than 2×-linear growth
  * (round-6 ADVICE: a 500× ratio could print next to pass=true with no
  * visible reason). Any entry whose binding bound was the floor is
  * flagged `floor_admitted` in the artifact and on stdout, so a huge
  * ratio that passed is visibly floor-admitted rather than silently
  * green.
  *
  * Emits one JSON artifact (SPARK_GRAFT_VOL_OUT, default
  * VOLPROBE_r07.json in the working dir) with per-query raw numbers,
  * ratios, and gate results; exits non-zero if any gate fails — AFTER
  * the finally block has removed the multi-GB temp corpora and stopped
  * the session (round-6 ADVICE: sys.exit inside the try skipped the
  * cleanup on exactly the failure path).
  */
object VolumeProbe {

  private def rmTree(d: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(d)
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
  }

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_VOL_FACTOR", "100").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_VOL_OUT", "VOLPROBE_r07.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // see class doc
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional comma-separated query-name filter for iterating on one
    // entry without paying the full ~25-min probe. The canonical 100×
    // artifact (VOLPROBE_r{N}.json) must come from an unfiltered run —
    // ALL entries present (20 as of round 13); the 1000× decade artifact
    // (VOLPROBE_1000X_r{N}.json) is a DELIBERATELY filtered run over the
    // flagship dedup chain + the span/audit families (the full family at
    // 1000× would spill the exact-baseline entries' ~37 GB each for no
    // additional plan-class evidence).
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_VOL_ONLY").map(_.split(",").map(_.trim).toSet)
    def wanted(n: String): Boolean = only.forall(_.contains(n))

    val dir1 = Files.createTempDirectory("graft-vol1").toString
    val dirN = Files.createTempDirectory(s"graft-vol$factor").toString
    var exitCode = 0
    try {
      val embNames =
        Set("sim_knn_graph", "dedup_embedding_pairs", "sim_ann_lsh",
          "emb_kmeans", "emb_pq_codes", "sim_pq_adc_topk", "sim_ivfpq_topk",
          "sim_ivfpq_residual_topk", "sim_ivfpq_trained_topk",
          "sim_ivfpq_rerank_topk", "sim_ivfpq_nprobe_topk",
          "sim_ivfpq_clustered_topk", "sim_ivfpq_full_trained_topk",
          "sim_ivfpq_full_clustered_topk",
          "sim_ivfpq_append", "sim_ivfpq_drift_guard",
          "sim_ivfpq_delete_topk", "sim_ivfpq_append_nprobe",
          "sim_ivfpq_cell_stats", "sim_ivfpq_gc_stats",
          "sim_ivfpq_compact_topk", "sim_ivfpq_cell_split",
          "emb_pq_trained_codes", "dedup_semdedup")
      // The lloyd loop's planted-chain fixture (see below) — its own
      // corpus, not the embeddings fixture.
      val kmlName = "kmeans_lloyd"
      // Entries whose declared plans carry exact-allowlisted bounded
      // broadcast cross joins (BroadcastGuardSpec documents the bounds);
      // their plan-shape arm pins the ABSOLUTE BNLJ count per entry at
      // both arms (round-13 ADVICE: mere cross-arm equality would pass an
      // unbounded nested loop present at BOTH arms — e.g. a regression
      // that drops the broadcast bound at fixture scale too). The counts
      // are the declared plans' own: emb_kmeans runs two Lloyd
      // iterations = two ≤ 8-row centroid cross joins; dsir's one cross
      // join is the scalar totals row; ivfpq's is the ≤ |cells|-row
      // probe-routing cross. kmeans_lloyd's count is ROUNDS-dependent
      // (one centroid cross per round) and pinned separately below.
      // The trained-cell ivfpq's count is the PLAN-TREE node count of
      // its bounded assign crosses after physical subtree sharing: the
      // logical tree duplicates the c2-fed chains, the planner shares
      // part of them, and the identity-deduped walk measures 6 BNLJ
      // nodes at every scale (4 distinct assigns — c1, c2, cells, probe
      // routing — plus the two re-rooted copies the sharing leaves).
      // AQE's stage cache dedupes the actual WORK down to exactly three
      // corpus assignment passes (BroadcastGuardSpec's allowlist
      // measurement).
      val boundedNested = Map("emb_kmeans" -> 2, "sample_dsir_weights" -> 1,
        "sim_ivfpq_topk" -> 1, "sim_ivfpq_residual_topk" -> 1,
        "sim_ivfpq_trained_topk" -> 6,
        // rerank wraps the sim_ivfpq_topk plan once (its one routing
        // cross) — the refine stage adds equi joins only; nprobe=2 is
        // the same index plan with a wider routing filter.
        "sim_ivfpq_rerank_topk" -> 1, "sim_ivfpq_nprobe_topk" -> 1,
        // clustered: same plan as sim_ivfpq_topk with the codes side
        // read from the pre-ensured cell-partitioned catalog table —
        // the one routing cross remains (the table write happens in
        // fixture setup, outside the measured run).
        "sim_ivfpq_clustered_topk" -> 1,
        // full-trained IVFPQR: the three Lloyd-chain assign crosses
        // (c1, c2, final cells) run INSIDE the residual-subspace
        // snapshot's one materialization job (everything downstream —
        // training rounds, encode, scan, refine — is equi joins over
        // the cached frame, so no re-rooted copies survive sharing).
        "sim_ivfpq_full_trained_topk" -> 3,
        // full-clustered: EVERY trained piece reads from pre-ensured
        // catalog tables (codes DPP-pruned, cells, codebook), so the
        // one bounded cross left is the probe-side KMeans.assign
        // routing against the <= 8-row persisted cell table.
        "sim_ivfpq_full_clustered_topk" -> 1,
        // append-admitted scan: same deployment plan as full-clustered
        // (probe-side assign is the one bounded cross); drift guard's
        // one cross is the corpus-side assign through the frozen cells.
        "sim_ivfpq_append" -> 1, "sim_ivfpq_drift_guard" -> 1,
        // delete: the append plan's probe-side assign cross — the
        // logical tree instantiates the <= 5-row probe pipeline twice
        // (scan distance tables + the probed-cell list pruning the
        // tombstone fetch) but the planner SHARES the subtree, so one
        // BNLJ node survives (measured at the 10x smoke); tombstone
        // build is ingest. cell stats' one cross is the <= |cells|-row
        // totals broadcast; the nprobe dial's is the rank <= 2 routing
        // cross.
        "sim_ivfpq_delete_topk" -> 1, "sim_ivfpq_append_nprobe" -> 1,
        "sim_ivfpq_cell_stats" -> 1,
        // compact/split: the deployment scan's one probe-side assign
        // cross (over the 8-row gc generation's cells / the 9-row split
        // cells table); the reclaim and split jobs' own crosses live
        // inside the tables' one-time writes (fixture setup).
        "sim_ivfpq_compact_topk" -> 1, "sim_ivfpq_cell_split" -> 1,
        // semdedup's two bounded crosses are the two routing levels of
        // the two-level assignment (round-15: the ≤ r-row super table
        // against the corpus — level 1 — and against the ≤ k-row cell
        // seed table — level 0), both inside the assigned snapshot's
        // materialization job, captured by the runtime plan walk; the
        // level-2 refine is a broadcast EQUI join, not a cross.
        "dedup_semdedup" -> 2,
        // bpe: one ≤ 1-row winner cross join per merge round, except the
        // last round whose merge has no consumer and is never built; the
        // encode path consumes every winner, so it carries the full
        // rounds of apply crosses on top of the rounds − 1 train merges.
        "text_bpe_train" -> (graft.queries.TextQueries.BpeMerges - 1),
        "text_bpe_encode" -> (2 * graft.queries.TextQueries.BpeMerges - 1))
      val triName = "graph_triangle_count"
      // PageRank (declared fixed-round + convergence-loop facade) rides
      // the same disjoint-copy co-order fixture.
      val prIterName = "pagerank_iterate"
      // LPA (declared fixed-round + run-to-termination facade, round 16)
      // rides the same disjoint-copy co-order fixture.
      val lpaIterName = "lpa_iterate"
      val graphNames =
        Set(triName, "graph_pagerank", prIterName, "graph_label_propagation",
          lpaIterName)
      val fuzzyName = "text_fuzzy_join_blocked"
      val fuzzyMultiName = "text_fuzzy_join_multikey"
      // The entity-cluster composition rides the same part fixture as
      // the fuzzy joins (its edges ARE the blocked fuzzy matches).
      val fuzzyNames = Set(fuzzyName, fuzzyMultiName,
        "linkage_entity_clusters", "linkage_golden_record")
      val needDocs = only.forall(_.exists(n =>
        !embNames.contains(n) && !graphNames.contains(n) &&
          !fuzzyNames.contains(n) && n != kmlName))
      val needEmb = only.forall(_.exists(embNames.contains))
      val needTri = graphNames.exists(wanted)
      val needPart = fuzzyNames.exists(wanted)
      val needKml = wanted(kmlName)

      if (needDocs) {
        val docs = spark.read.parquet(s"$sf/documents.parquet")
        docs.write.mode("overwrite").parquet(s"$dir1/documents.parquet")
        // Same per-copy salting as ScaleProbeSpec (offset ids, per-copy
        // word tags) built as ONE crossJoin against the copy-tag range
        // instead of a factor-way union: identical content, and the plan
        // stays O(1) in factor — a 1000-way union is where Catalyst,
        // not the data, becomes the bottleneck. Row ORDER differs from
        // the union form; every declared query is partition/order
        // invariant (PartitionInvarianceSpec), so artifacts compare.
        docs.crossJoin(
            spark.range(factor).select(col("id").cast("int").as("tag")))
          .select(
            (col("doc_id") + col("tag") * 100000000L).as("doc_id"),
            concat_ws(" ",
              transform(split(col("text"), " "),
                w => concat(w, lit("q"), col("tag").cast("string")))).as("text"),
            col("lang"), col("source"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$dirN/documents.parquet")
      }

      // Embeddings: per-copy orthogonal ±1 diagonal (murmur3(dim, copy)
      // parity — deterministic), the same fixture rule as
      // ScaleProbeSpec's 10× family, at the probe factor.
      if (needEmb) {
        val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        emb.write.mode("overwrite").parquet(s"$dir1/embeddings.parquet")
        // Same crossJoin-against-the-tag-range form as the docs builder
        // (identical content to the old factor-way union, O(1) plan in
        // factor; order differs — every declared query is
        // partition/order-invariant). hash(i, tag) is the same murmur3
        // call whether tag is a literal or a column.
        // Copy offset 2²² (not the docs' 10⁸): dedup_embedding_pairs
        // packs candidate pairs into shiftleft(a,32)+b under an ENFORCED
        // 0 ≤ vec_id < 2³² precondition (ids beyond that take the
        // documented struct-pack form), so the probe's id universe must
        // model the declared regime — 2²² keeps max id under 2³² through
        // factor 1023 while copies stay disjoint (sf0.1 has 2 000
        // vectors ≪ 2²²). With the old 10⁸ offset, factor ≥ 43 ids
        // crossed 2³² and the query now raises rather than corrupt.
        emb.crossJoin(
            spark.range(factor).select(col("id").cast("int").as("tag")))
          .select(
            (col("vec_id") + col("tag") * (1L << 22)).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              when(pmod(hash(i, col("tag")), lit(2)) === 1, negate(x))
                .otherwise(x)).as("embedding"),
            col("label"))
          .write.mode("overwrite").parquet(s"$dirN/embeddings.parquet")
      }

      // Pre-ensure the cell-partitioned codes tables for the clustered
      // IVFADC entry so the MEASURED run reads the catalog table only —
      // the one-time partitioned write is ingest (fixture setup), not
      // the retrieval plan the gates are about (the bucketedFacts
      // doctrine: layout is paid at ingest, amortized over queries).
      if (wanted("sim_ivfpq_clustered_topk")) {
        SimilarityQueries.ivfpqCodesTable(spark, dir1)
        SimilarityQueries.ivfpqCodesTable(spark, dirN)
      }
      if (wanted("sim_ivfpq_full_clustered_topk")) {
        SimilarityQueries.ivfpqFullCodesTable(spark, dir1)
        SimilarityQueries.ivfpqFullCodesTable(spark, dirN)
        SimilarityQueries.ivfpqFullArtifactTables(spark, dir1)
        SimilarityQueries.ivfpqFullArtifactTables(spark, dirN)
      }
      if (wanted("sim_ivfpq_append") || wanted("sim_ivfpq_drift_guard") ||
          wanted("sim_ivfpq_delete_topk") || wanted("sim_ivfpq_append_nprobe") ||
          wanted("sim_ivfpq_cell_stats") || wanted("sim_ivfpq_gc_stats") ||
          wanted("sim_ivfpq_compact_topk") || wanted("sim_ivfpq_cell_split")) {
        SimilarityQueries.ivfpqAppendPersisted(spark, dir1)
        SimilarityQueries.ivfpqAppendPersisted(spark, dirN)
      }
      // The tombstone table is ingest too (the delete ADMISSION is the
      // tombstone-isolation arm's measured job; the declared query's
      // cost is the fetch + anti-join it gates).
      if (wanted("sim_ivfpq_delete_topk") || wanted("sim_ivfpq_gc_stats") ||
          wanted("sim_ivfpq_compact_topk")) {
        SimilarityQueries.ivfpqTombstones(spark, dir1)
        SimilarityQueries.ivfpqTombstones(spark, dirN)
      }
      // The compacted generation and the split generation are ingest as
      // well — the one-time rewrites are the maintenance jobs their
      // isolation arms measure; the declared queries read the catalog.
      if (wanted("sim_ivfpq_compact_topk")) {
        SimilarityQueries.ivfpqCompactedCodes(spark, dir1)
        SimilarityQueries.ivfpqCompactedCodes(spark, dirN)
      }
      if (wanted("sim_ivfpq_cell_split")) {
        SimilarityQueries.ivfpqSplitTables(spark, dir1)
        SimilarityQueries.ivfpqSplitTables(spark, dirN)
      }

      // Dense-id embedding fixture for the semdedup cells dial (the
      // kmeans_lloyd own-fixture precedent): vec_id < k·factor selects
      // seeds only where ids are DENSE in [0, k·factor), and the shared
      // fixture's 2²² copy offset caps that at the 1× id range (2 000)
      // — a fixture id-space property, not an operator one (the dial
      // held exactly linear at factor 100, the last rung the shared
      // offsets support). Same per-copy orthogonal sign-flip salting;
      // the only change is the copy offset = the 1× vector count, so
      // the salted copies 1..k/n₁−1 become legitimate extra seeds.
      if (wanted("dedup_semdedup")) {
        val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        val n1 = emb.count()
        emb.write.mode("overwrite").parquet(s"$dir1/semdd/embeddings.parquet")
        emb.crossJoin(
            spark.range(factor).select(col("id").cast("int").as("tag")))
          .select(
            (col("vec_id") + col("tag") * n1).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              when(pmod(hash(i, col("tag")), lit(2)) === 1, negate(x))
                .otherwise(x)).as("embedding"),
            col("label"))
          .write.mode("overwrite").parquet(s"$dirN/semdd/embeddings.parquet")
      }

      // Co-order graph fixture: factor× disjoint copies via offsets on
      // BOTH keys (the ScaleProbeSpec `tri` rationale: offsetting only
      // the orderkey would pile co-occurrence SUPPORT onto the same part
      // pairs and densify the graph as a duplication artifact; disjoint
      // copies are the honest "more orders over a wider catalog" shape).
      if (needTri) {
        // Full columns: Tables.lineitem normalizes l_shipdate at the
        // source boundary and fails fast on a missing column.
        val li = spark.read.parquet(s"$sf/lineitem.parquet")
        li.write.mode("overwrite").parquet(s"$dir1/tri/lineitem.parquet")
        val keyOff = 1000000000L
        // crossJoin form of the disjoint-copy offsets (see docs builder).
        li.crossJoin(
            spark.range(factor).select(col("id").as("tag")))
          .withColumn("l_orderkey", col("l_orderkey") + col("tag") * keyOff)
          .withColumn("l_partkey", col("l_partkey") + col("tag") * keyOff)
          .drop("tag")
          .write.mode("overwrite").parquet(s"$dirN/tri/lineitem.parquet")
      }

      // Part-name fixture for the blocked fuzzy join (round-10 verdict
      // #3): the salted arm tags EVERY token per copy (edit distances
      // within a copy are preserved — both names gain the same-position
      // suffix — while cross-copy same-block candidates are impossible:
      // sharing a block means sharing the tagged last token, i.e. the
      // copy), so the organic workload grows exactly factor×. On TOP of
      // that, both arms carry a synthetic hot block whose last token is
      // NEVER salted — 20 similar names at 1×, 20·factor at factor× —
      // so the blocking key goes genuinely Zipf at scale and the probe
      // can gate that the MaxBlock cap ENGAGES (the over-cap block is
      // skipped wholesale) instead of the self-join going quadratic in
      // the hot block.
      if (needPart) {
        val part = spark.read.parquet(s"$sf/part.parquet")
          .select("p_partkey", "p_name", "p_retailprice")
        // Hot-name keys live at 10^12 — beyond any salted copy's range
        // (p_partkey + tag·10^8 stays < 10^11 at factor ≤ 1000), so
        // partkeys are globally unique in BOTH arms (round-11 ADVICE:
        // the old 9·10^8 base collided with the tag-9 copy from factor
        // 10 — harmless while every fuzzy gate keys on p_name, but a
        // latent trap for any future partkey-keyed gate).
        def hotNames(n: Long) = spark.range(n).select(
          (col("id") + 1000000000000L).as("p_partkey"),
          concat(lit("hotname"), col("id").cast("string"),
            lit(" zzcommonblock")).as("p_name"),
          lit(1.0d).as("p_retailprice"))
        part.unionByName(hotNames(20L))
          .write.mode("overwrite").parquet(s"$dir1/part.parquet")
        part.crossJoin(
            spark.range(factor).select(col("id").cast("int").as("tag")))
          .select(
            (col("p_partkey") + col("tag") * 100000000L).as("p_partkey"),
            concat_ws(" ",
              transform(split(col("p_name"), " "),
                w => concat(w, lit("q"), col("tag").cast("string")))).as("p_name"),
            col("p_retailprice"))
          .unionByName(hotNames(20L * factor))
          .write.mode("overwrite").parquet(s"$dirN/part.parquet")
      }

      // Planted migration-chain fixture for the kmeans_lloyd entry
      // (round-13 verdict #4): a heavy blob at 0 plus a LINEAR chain of
      // distinct points — k = 2 Lloyd with the top chain point as the
      // second seed makes the cluster boundary DESCEND the chain
      // geometrically (the captured centroid's mean walks ~3/4 of the
      // way down per round), so convergence rounds grow ~log₂ of the
      // chain extent: measured by exact integer simulation, 5 rounds at
      // L = 100 and 11 at L = 10 000. The factor× arm scales BOTH the
      // blob (records grow ~factor× per round) and the chain length
      // (rounds grow with the copy count — the property the
      // rounds-normalized gate exists to exercise; a fixed-rounds
      // fixture would never distinguish the normalized gate from the
      // flat one). Values are millunit-exact (chain step 1 millunit =
      // 0.001f), so quantization is lossless and the trajectory is the
      // simulated one: rounds 5/6/8/10 at factors 1/10/100/1000. The
      // 1-millunit step keeps the chain extent inside the packed-argmin
      // domain (dist·16 must fit a long, so extent < ~7.6e5 millunits —
      // a 10-millunit step OVERFLOWED at factor 1000, raising the ANSI
      // fail-fast in KMeans.assign exactly as designed; the operator's
      // own input domain is |q| ≲ 4e3 millunits, embeddings-scale).
      // vec_id 0 = a blob point (seed centroid 0), vec_id 1 = the chain
      // top (seed centroid 1) — the lloyd init convention.
      val kmlBlob1 = 5000L
      val kmlChain1 = 100L
      if (needKml) {
        def kmlFixture(dir: String, blob: Long, chain: Long): Unit = {
          val blobPts = spark.range(blob)
            .select(when(col("id") === 0, 0L).otherwise(col("id") + 1).as("vec_id"),
              lit(0.0f).as("x"))
          val chainPts = spark.range(chain)
            .select(when(col("id") === chain - 1, 1L)
                .otherwise(col("id") + blob + 1).as("vec_id"),
              ((col("id") + 1).cast("double") * lit(0.001d))
                .cast("float").as("x"))
          blobPts.unionByName(chainPts)
            .select(col("vec_id"),
              concat(array(col("x")), array_repeat(lit(0.0f), 63)).as("embedding"))
            .write.mode("overwrite").parquet(s"$dir/kml/embeddings.parquet")
        }
        kmlFixture(dir1, kmlBlob1, kmlChain1)
        kmlFixture(dirN, kmlBlob1 * factor, kmlChain1 * factor)
      }

      // Shuffle partitions TRACK the measured volume (hoisted above the
      // query list so the lloyd closures can size their loop width) —
      // the deployment posture: a 1000-executor cluster sizes partitions
      // to a fixed per-partition byte budget, not a fixed count. At
      // factor ≤ 100 this is the same 32 every committed artifact used;
      // at 1000× a fixed 32 would pack 10× the 100× partition size and
      // the probe OOMs on execution memory — a fixture-host artifact,
      // not an operator property. Partition count changes NO gated
      // quantity (shuffle records, join rows, and plan class are
      // partition-layout-invariant; PartitionInvarianceSpec pins the
      // results themselves).
      val partsN = math.min(1024, cpus.toInt * math.max(1, factor / 100))

      // ⌈log₂ factor⌉ extra LSH planes at factor× vectors — the
      // deployment re-parameterization the embedding entries gate.
      val extraPlanes = math.ceil(math.log(factor) / math.log(2)).toInt
      // The PAIRS query also grows hash tables for recall, and tables
      // multiply candidate volume (~L·n²·s/2^k per the operator scaladoc),
      // so ITS plane growth must absorb the table growth too:
      // Δk = ⌈log₂(factor · L/L₀)⌉ solved as a fixed point with
      // L = 2 + (Δk+1)/3. At factor 100: Δk=8, L=5 — the first probe run
      // gated the naive Δk=7 (11 planes, 4 tables) and failed at 2.19×
      // linear, exactly the un-absorbed 2× table factor.
      val (pairPlanes, pairTables) = {
        var dk = extraPlanes
        var l = 2 + (dk + 1) / 3
        var next = math.ceil(math.log(factor * l / 2.0) / math.log(2)).toInt
        while (next != dk) {
          dk = next; l = 2 + (dk + 1) / 3
          next = math.ceil(math.log(factor * l / 2.0) / math.log(2)).toInt
        }
        (4 + dk, l)
      }

      // The saturation ladder's input is the DEPLOYED corpus size —
      // factor× the 1× doc count (a cheap metadata count).
      val nDocs1 = spark.read.parquet(s"$sf/documents.parquet").count()

      // (name, 1× query, factor× query). Same function at both scales
      // except the embedding family, whose factor× form grows the plane
      // count per the log₂ rule (a fixed blocking at growing n densifies
      // every bucket and measures the drop branch, not the operator).
      val queries: Seq[(String, DedupQueries.Q, DedupQueries.Q)] = {
        def sym(n: String, q: DedupQueries.Q) = (n, q, q)
        Seq(
          sym("dedup_minhash_capped", DedupQueries.dedupMinhashCapped),
          sym("dedup_jaccard_on_lsh", DedupQueries.dedupJaccardOnLsh),
          // round 15: the sketch-calibration composition — candidate
          // generation and exact rescoring are the two probed shapes
          // above; the estimate join adds candidates ⋈ the per-doc
          // signature table twice (narrow rows, candidate-mass-bounded),
          // so the whole query is linear by composition; flat gates.
          sym("dedup_minhash_estimate", DedupQueries.dedupMinhashEstimate),
          sym("dedup_clusters_raw", DedupQueries.dedupClustersRaw),
          // The two other heavy declared dedup plans: the df-capped exact
          // shingle self-join (word salting preserves each shingle's
          // document frequency, so the df≤64 cap drops the same shingle
          // universe at every factor) and the span-profiling equi-join.
          sym("dedup_ngram_jaccard_capped", DedupQueries.dedupNgramJaccardCapped),
          // round 10: containment rides the same df-capped shingle
          // universe and intersection join (word salting preserves each
          // shingle's df per copy, and Jaccard/containment are invariant
          // under the injective per-copy renaming, so true pairs grow
          // exactly linearly — same argument as the Jaccard entries).
          sym("dedup_containment", DedupQueries.dedupContainment),
          // round 10: the co-order triangle pipeline on its disjoint-copy
          // lineitem fixture — the one corpus-scale shuffle is the basket
          // collect_set; edges/wedges/triangles all grow factor× by
          // construction.
          (triName,
            (s: SparkSession, dd: String) =>
              graft.queries.LinkageQueries.graphTriangleCount(s, s"$dd/tri"),
            (s: SparkSession, dd: String) =>
              graft.queries.LinkageQueries.graphTriangleCount(s, s"$dd/tri")),
          // round 14: PageRank on the same disjoint-copy fixture — the
          // factor× graph is factor disjoint copies of the 1× graph
          // (identical degrees, fixed 3 rounds), so the basket collapse
          // and every per-round join + destination aggregate grow
          // exactly factor×; flat gates apply.
          ("graph_pagerank",
            (s: SparkSession, dd: String) =>
              graft.queries.LinkageQueries.graphPagerank(s, s"$dd/tri"),
            (s: SparkSession, dd: String) =>
              graft.queries.LinkageQueries.graphPagerank(s, s"$dd/tri")),
          // round 15: label propagation on the same disjoint-copy graph
          // fixture — labels never cross copies (no edges do), so the
          // per-round vote join + two aggregates grow exactly factor×
          // at the pagerank-gated plan class; flat gates apply.
          ("graph_label_propagation",
            (s: SparkSession, dd: String) =>
              graft.queries.LinkageQueries.graphLabelPropagation(s, s"$dd/tri"),
            (s: SparkSession, dd: String) =>
              graft.queries.LinkageQueries.graphLabelPropagation(s, s"$dd/tri")),
          // round 14: BPE merge training on the salted docs corpus — the
          // corpus-scale word count grows factor× (per-copy word tags
          // make vocabularies disjoint) while every merge round stays
          // bounded by the 4096-word vocabulary cap, so total volume is
          // ≤ linear; the rounds − 1 winner cross joins are ≤ 1-row
          // bounded (pinned below).
          sym("text_bpe_train", graft.queries.TextQueries.textBpeTrain),
          // round 14: the apply path — merges fold over the DISTINCT-word
          // table (vocabulary-scale, factor× distinct salted words), the
          // corpus pays the word explode plus ONE occurrence→token-count
          // equi join; 11 bounded crosses (5 train merges + 6 applies).
          sym("text_bpe_encode", graft.queries.TextQueries.textBpeEncode),
          // round 10 (r9 verdict #1): the banded SimHash join, whose
          // 20-bit block-pair keys approach birthday saturation near the
          // 100× corpus (~500 k docs vs the (6,2) rule bound of ~140 k).
          // The 1× arm runs the DECLARED (6,2) — its recorded baseline is
          // the declared plan's real shuffle volume (round-10 ADVICE: both
          // arms previously ran the grown form, silently re-baselining) —
          // and the factor× arm runs the (m, r) the saturation ladder
          // picks for factor× docs ((7,3): 35 triples of 24–27-bit keys),
          // EquivalenceSpec-pinned bit-identical to (6,2), exactly as the
          // embedding entries run their grown (k, L). The records/joinrows
          // gates for this entry normalize by the C(m,r)/C(6,2) band
          // multiplicity the ladder step itself adds (see below).
          ("dedup_simhash_banded",
            DedupQueries.dedupSimhashBandedBlocks(6, 2),
            { val (m, r) = DedupQueries.simhashBandedParamsFor(nDocs1 * factor)
              DedupQueries.dedupSimhashBandedBlocks(m, r) }),
          sym("text_dup_span_ratio", graft.queries.TextQueries.textDupSpanRatio),
          // round 14: the bigram-LM fluency scorer — per-copy word
          // tagging makes each copy's bigram vocabulary disjoint, so
          // the model table, the collapsed per-doc bigram stream, and
          // the one corpus-scale scoring join all grow exactly
          // factor×; the flat gates apply unmodified.
          sym("text_lm_fluency", graft.queries.TextQueries.textLmFluency),
          // round 15: the CCNet tercile cut over the same disjoint
          // bigram vocabularies — scores grow factor×, the counting
          // aggregate's (lang, score) table is score-domain-bounded,
          // and the one corpus-scale scoring join matches lm_fluency's;
          // flat gates apply unmodified.
          sym("text_ccnet_buckets", graft.queries.TextQueries.textCcnetBuckets),
          // round 11 (r10 verdict #3): the two linkage operators that had
          // only a 10× point. The fuzzy join rides the salted-vocab +
          // unsalted-hot-block part fixture above; its entry gate also
          // requires the MaxBlock cap to ENGAGE at factor× (the Zipf
          // block is dropped wholesale, so join rows stay ~linear where
          // an uncapped join would add C(20·factor, 2) hot pairs).
          sym(fuzzyName, graft.queries.LinkageQueries.textFuzzyJoinBlocked),
          // round 12 (r11 verdict #4): the declared multikey form on the
          // same salted-vocab + unsalted-hot-block fixture — per-token
          // salting keeps BOTH tagged block spaces (last ∪ first token)
          // disjoint per copy; the hot block lives in L space only (hot
          // first tokens are all distinct), so its cap-engagement gate
          // checks the tagged union.
          sym(fuzzyMultiName, graft.queries.LinkageQueries.textFuzzyJoinMulti),
          // round 14: the ER cluster composition over the blocked fuzzy
          // match graph — same part fixture (salted copies keep match
          // components within a copy, so component structure and rounds
          // stay flat while edge volume grows factor×); the cap gate
          // applies (an un-skipped hot block would glue 20·factor names
          // into one mega-entity), and joinrows normalize by measured
          // component rounds, the dedup_clusters_raw discipline.
          sym("linkage_entity_clusters",
            graft.queries.LinkageQueries.linkageEntityClusters),
          // round 14: the survivorship MERGE step over the same entity
          // clusters — adds one catalog aggregate + one vocabulary-scale
          // join on top; same fixture, same cap gate, same measured-
          // round joinrows normalization (the component loop runs
          // inside it verbatim).
          sym("linkage_golden_record",
            graft.queries.LinkageQueries.linkageGoldenRecord),
          // The sharded inverted index on the salted docs corpus: terms
          // are per-copy distinct, so (term, doc) pairs — the one
          // corpus-scale shuffle — grow exactly factor×; the entry gate
          // additionally proves the posting-row bound (max df_shard ≤
          // PostingShard) held at factor×, i.e. no unbounded
          // collect_list ever materialized.
          sym("text_inverted_index", graft.queries.LinkageQueries.textInvertedIndex),
          // round 9: the split-leakage audit rides the same salted corpus;
          // its risk mode is the count-distinct expansion over
          // (source, digest) groups — dup groups grow ~factor×.
          sym("split_leakage_audit", graft.queries.SamplingQueries.splitLeakageAudit),
          // Span REMOVAL: the token-level anti join is the heaviest
          // shuffle shape in the surface (every token moves once) —
          // exactly the plan whose 100x linearity needs a recorded point.
          sym("text_dedup_spans", graft.queries.TextQueries.textDedupSpans),
          // The embedding family (round-6 verdict #1): the bucket
          // self-join with inline cosine + single-exchange rank, riding
          // the plane-growth rule whose constant matters more at 100×
          // than 10×. Planes-only is recall-safe through k = 13
          // (RecallSpec measured the (1−p^16)^3 ≈ 0.80 decay at k = 16),
          // so past that boundary — the 1000× decade — the factor× form
          // grows BOTH dials via the pairs fixed point at this
          // operator's L₀ = 3: (18, 7) at factor 1000, recall-pinned.
          ("sim_knn_graph",
            SimilarityQueries.simKnnGraphPlanes(SimilarityQueries.NPlanes),
            { if (SimilarityQueries.NPlanes + extraPlanes <= 13)
                SimilarityQueries.simKnnGraphPlanes(
                  SimilarityQueries.NPlanes + extraPlanes)
              else {
                // The operator's own dials, not literals (round-12
                // ADVICE): L₀ = NTables, k₀ = NPlanes — if either moves,
                // the grown form moves with it.
                val l0 = SimilarityQueries.NTables
                var dk = extraPlanes
                var l = l0 + (dk + 1) / 3
                var next = math.ceil(math.log(factor * l / l0.toDouble) / math.log(2)).toInt
                while (next != dk) {
                  dk = next; l = l0 + (dk + 1) / 3
                  next = math.ceil(math.log(factor * l / l0.toDouble) / math.log(2)).toInt
                }
                SimilarityQueries.simKnnGraphPlanes(
                  SimilarityQueries.NPlanes + dk, l)
              } }),
          // round 10 (r9 verdict #2): the multi-probe online ANN search,
          // riding the same ⌈log₂ factor⌉ plane growth as the kNN graph
          // (its multiprobe fan grows only linearly in k, so no table
          // term — see simAnnLshPlanes scaladoc); RecallSpec pins the
          // grown k = 13 form ≥ 0.9 on planted near-dups.
          ("sim_ann_lsh",
            SimilarityQueries.simAnnLshPlanes(SimilarityQueries.NPlanes),
            SimilarityQueries.simAnnLshPlanes(
              SimilarityQueries.NPlanes + extraPlanes)),
          ("dedup_embedding_pairs",
            DedupQueries.dedupEmbeddingPairsPlanes(4),
            // Both (k, L) dials via the fixed-point rule above — (12, 5)
            // at factor 100; RecallSpec pins that form at ≥0.9 recall.
            DedupQueries.dedupEmbeddingPairsPlanes(pairPlanes, pairTables)),
          // round 15: SemDeDup — the factor× arm runs the paper's own
          // deployment dial, cells ∝ n (50 k cells at 440 M embeddings
          // in the paper), which holds within-cell pair mass linear.
          // Assignment is TWO-LEVEL ROUTED (r14 verdict #1): n·√k per
          // level instead of the old flat n·k cross, each level gated
          // below with a real balance bound; the quadratic-risk term —
          // the within-cell pair join — is measured in ISOLATION
          // against the flat linear bound, the ivfpq-scan pattern.
          ("dedup_semdedup",
            (s: SparkSession, dd: String) =>
              DedupQueries.dedupSemdedupCells(
                DedupQueries.SemdedupCells)(s, s"$dd/semdd"),
            (s: SparkSession, dd: String) =>
              DedupQueries.dedupSemdedupCells(
                DedupQueries.SemdedupCells * factor)(s, s"$dd/semdd")),
          // round 13 (r12 verdict #1): the two r12-landed operators get
          // their 100× point. kmeans runs the DECLARED fixed-2-iteration
          // form at both arms (k = 8 is the operator's parameter, not a
          // scale dial — the ×8 cross-join expansion collapses in-stage,
          // so records and join rows are ~16·n at any corpus size and
          // the flat 2×-linear gates ARE the per-iteration gates);
          // per-copy ±1 diagonals change which vectors seed init across
          // arms, which affects no gated ratio.
          sym("emb_kmeans", SimilarityQueries.embKmeans),
          // dsir: the ≤ 2·DsirB-row stats table is the only broadcast
          // side by construction; the entry's extra gate records, at
          // BOTH arms, how many broadcast subtrees contain a documents
          // file scan and requires ZERO — the structural form of "the
          // pool token stream was never the elected/forced build side"
          // (the un-pinned fixture-scale plan DID broadcast it).
          sym("sample_dsir_weights",
            graft.queries.SamplingQueries.sampleDsirWeights),
          // round 13: the PQ pair rides the embeddings fixture at its
          // fixed operator parameters (8 subspaces, k = 4 seed codebook,
          // 5 probes — none is a scale dial). Both collapse their
          // candidate expansions in-stage through packed-min/sum
          // aggregates over pinned bounded broadcasts, and neither plan
          // has a nested loop (all joins are equi on the subspace key),
          // so the blanket plan-sane arm applies.
          sym("emb_pq_codes", SimilarityQueries.embPqCodes),
          sym("sim_pq_adc_topk", SimilarityQueries.simPqAdcTopk),
          // round 14: the IVF×PQ composition (r13 verdict #1), fixed
          // operator parameters like the PQ pair. The blanket arms gate
          // the whole declared plan; its entry-specific arm below
          // measures the ADC SCAN in isolation over a snapshotted index
          // and pins scan join rows to the probed-cell mass — the
          // sub-linear-scan property that justifies composing IVF in.
          sym("sim_ivfpq_topk", SimilarityQueries.simIvfPqTopk),
          // round 14: the residual-encoded IVFADC twin — same fixture,
          // same blanket + scan-isolation arms (the entry block below
          // picks the residual index builder by name).
          sym("sim_ivfpq_residual_topk", SimilarityQueries.simIvfPqResidualTopk),
          // round 14: the TRAINED-cell IVFADC (cells = two-Lloyd
          // k-means assignment instead of labels; cell sizes for the
          // scan gate come from the codes frame itself).
          sym("sim_ivfpq_trained_topk", SimilarityQueries.simIvfPqTrainedTopk),
          // round 14: the exact re-rank refine stage over the IVFADC
          // shortlist — blanket arms over the whole two-stage plan; its
          // entry arm below snapshots the shortlist and pins the refine
          // join output CONSTANT across arms (≤ 2·|probes|·R rows at any
          // corpus size — the fetch-by-id property that makes re-rank
          // the deployment answer to PQ loss).
          sym("sim_ivfpq_rerank_topk", SimilarityQueries.simIvfPqRerankTopk),
          // round 14: nprobe = 2 multi-cell routing — the scan gate sums
          // probed-cell mass over BOTH routed cells per probe (the
          // routed list below carries (probe, cell) pairs, so the
          // expected-mass computation is nprobe-generic already).
          sym("sim_ivfpq_nprobe_topk", SimilarityQueries.simIvfPqNprobeTopk),
          // round 15 (r14 verdict #3): the clustered-scan IVFADC — the
          // codes side reads the cell-PARTITIONED catalog table
          // pre-ensured in fixture setup; same blanket + scan-isolation
          // arms as sim_ivfpq_topk (the entry block below picks the
          // table-backed codes by name). File-level pruning itself is
          // PartitionPruningSpec's pin (DPP's size heuristic needs
          // deployment-scale asymmetry the fixture can't fake here);
          // this entry gates that the table-backed scan keeps the
          // join-level probed-cell bound and linear volumes.
          sym("sim_ivfpq_clustered_topk",
            SimilarityQueries.simIvfPqClusteredTopk),
          // round 15 (r14 verdict #6): the fully-trained IVFPQR — trained
          // cells + trained residual codebooks + residual encode + exact
          // re-rank in ONE declared plan. Blanket arms over the whole
          // two-stage plan; the scan-isolation arm below picks its index
          // builder by name (cell sizes come from the codes frame, so
          // the probed-cell expectation is trained-cell-generic), and
          // the refine arm pins its re-rank join output CONSTANT across
          // arms exactly like sim_ivfpq_rerank_topk.
          sym("sim_ivfpq_full_trained_topk",
            SimilarityQueries.simIvfPqFullTrainedTopk),
          // round 16 (r15 verdict #1): the two round-15 flagships
          // composed with each other — the FULLY-TRAINED index persisted
          // clustered by cell, scanned through DPP with exact re-rank.
          // Blanket arms over the whole declared plan; the scan-isolation
          // arm below reads the table-backed codes with the trained scan
          // table, and the refine arm pins the re-rank join output
          // constant across arms (the full_trained contract at the
          // persisted layout).
          sym("sim_ivfpq_full_clustered_topk",
            SimilarityQueries.simIvfPqFullClusteredTopk),
          // round 17 (r16 verdict #1): the append-admitted index's
          // declared scan — base-trained frozen artifacts, base codes
          // day-0, delta codes appended day-1 through the catalog. Same
          // blanket + scan/refine isolation arms as full-clustered, PLUS
          // the dedicated admission-isolation arm below gating the delta
          // encode's join/shuffle work against analytic |delta|-only
          // bounds (admission must cost ∝ |delta|, never ∝ |corpus|).
          sym("sim_ivfpq_append", SimilarityQueries.simIvfPqAppendTopk),
          // round 18 (r17 verdict #1): the DELETE path — tombstones
          // routed through the frozen artifacts at |deleted|-only cost
          // (the tombstone-isolation arm below), fetched cell-pruned,
          // anti-joined into the DPP-pruned scan. Blanket arms over the
          // declared plan; the scan-isolation arm reads the LIVE
          // (anti-joined) codes so the probed-cell mass bound is the
          // post-delete one; the refine arm pins the constant re-rank.
          sym("sim_ivfpq_delete_topk", SimilarityQueries.simIvfPqDeleteTopk),
          // round 18 (r17 verdict #2): the declared nprobe = 2 dial on
          // the frozen persisted artifacts — the scan-isolation arm
          // gates the probed mass over BOTH routed cells per probe
          // against the same half-a-full-scan denominator, and the
          // refine arm pins the constant re-rank at the widened dial.
          sym("sim_ivfpq_append_nprobe",
            SimilarityQueries.simIvfPqAppendNprobeTopk),
          // round 18 (r17 verdict #3): the per-cell balance audit — one
          // m = 0 corpus scan into a <= |cells|-row aggregate; the
          // custom arm pins joinrows CONSTANT (the <= |cells|-row totals
          // cross) across arms.
          sym("sim_ivfpq_cell_stats", SimilarityQueries.simIvfPqCellStats),
          // round 18: the gc audit — the cell-stats posture plus one
          // <= |cells|-row broadcast join against the per-cell tombstone
          // counts; its custom arm pins joinrows CONSTANT across arms.
          sym("sim_ivfpq_gc_stats", SimilarityQueries.simIvfPqGcStats),
          // round 18: the post-compaction scan — the append deployment
          // plan over the COMPACTED generation (no anti-join anywhere);
          // scan/refine isolation arms pick the gc table by name, and
          // the compaction-isolation arm below gates the reclaim job's
          // join output against the exact 16·M_t − 8·D decomposition
          // (touched-cell mass, never the corpus... on this uniform
          // fixture M_t spans all cells — the locality is file-level,
          // IvfpqMaintenanceSpec's dynamic-overwrite pin).
          sym("sim_ivfpq_compact_topk", SimilarityQueries.simIvfPqCompactTopk),
          // round 18: the post-split scan — probe routing over the
          // 9-row split cells table, DPP-pruned codes from the split
          // generation; the split-isolation arm below gates the member
          // re-encode + 2-means chain against |parent cell|-only bounds.
          sym("sim_ivfpq_cell_split", SimilarityQueries.simIvfPqCellSplit),
          // round 17: the retrain trigger — one linear pass per side
          // through the frozen ≤ 8/≤ 32-row broadcast artifacts into one
          // global aggregate; flat gates, one bounded assign cross.
          sym("sim_ivfpq_drift_guard", SimilarityQueries.simIvfPqDriftGuard),
          // round 14: the trained-codebook PQ encode — three corpus
          // passes (two Lloyd rounds + the final encode), each an EQUI
          // broadcast-hash join on the subspace index collapsed by the
          // packed-min aggregate; the blanket no-nested-loop arm
          // applies (no cross join anywhere in this plan).
          sym("emb_pq_trained_codes", SimilarityQueries.embPqTrainedCodes),
          // round 14 (r13 verdict #4): the run-to-convergence Lloyd loop
          // on the planted migration-chain fixture — rounds GROW with
          // the chain extent (5 → ~11 at 100×, by exact simulation), so
          // the records/joinrows gates normalize by measured rounds,
          // the dedup_clusters_raw discipline. loopParts tracks the
          // probe's volume-scaled width.
          (kmlName,
            (s: SparkSession, dd: String) =>
              graft.operators.KMeans.lloyd(
                s.read.parquet(s"$dd/kml/embeddings.parquet"),
                k = 2, dims = 64, loopParts = cpus.toInt, maxRounds = 40),
            (s: SparkSession, dd: String) =>
              graft.operators.KMeans.lloyd(
                s.read.parquet(s"$dd/kml/embeddings.parquet"),
                k = 2, dims = 64, loopParts = partsN, maxRounds = 40)),
          // round 14: the PageRank convergence loop on the co-order
          // fixture — rounds are set by the damping contraction
          // (~log(dR0/tol)/log(1/0.85)), NOT graph size, so the entry
          // gates rounds FLAT across arms (+2 floor slack) while
          // records/joinrows normalize by the measured count; the loop
          // must converge at both arms (exit-on-cap would silently
          // shrink the normalizer).
          (prIterName,
            (s: SparkSession, dd: String) =>
              graft.operators.PageRank.iterate(
                graft.queries.LinkageQueries.coOrderPairs(s, s"$dd/tri"),
                tol = 1000L, loopParts = cpus.toInt),
            (s: SparkSession, dd: String) =>
              graft.operators.PageRank.iterate(
                graft.queries.LinkageQueries.coOrderPairs(s, s"$dd/tri"),
                tol = 1000L, loopParts = partsN)),
          // round 16 (r15 verdict #7): the BPE run-to-target trainer —
          // the corpus pays exactly one scan (the word-count aggregate
          // behind the capped vocabulary); every round is a projection
          // over ≤ BpeVocabCap rows with the ≤ 1-row arg-max collected
          // driver-side, so records/joinrows normalize by measured
          // rounds and the salted 10×/100× corpora (disjoint per-copy
          // word universes) must train the full target at both arms.
          ("bpe_train_loop",
            (s: SparkSession, dd: String) =>
              graft.operators.Bpe.train(
                graft.queries.TextQueries.bpeDocWords(s, dd),
                graft.queries.TextQueries.BpeMerges,
                minCount = 2L, loopParts = cpus.toInt),
            (s: SparkSession, dd: String) =>
              graft.operators.Bpe.train(
                graft.queries.TextQueries.bpeDocWords(s, dd),
                graft.queries.TextQueries.BpeMerges,
                minCount = 2L, loopParts = partsN)),
          // round 16 (r15 verdict #4): the LPA run-to-termination loop
          // on the disjoint-copy co-order fixture. Rounds are a property
          // of each copy's community structure — copies are identical,
          // so rounds must be FLAT across arms (the pagerank_iterate
          // convention, +2 slack for the max-over-copies of any
          // tie-order wobble); records/joinrows normalize by the
          // measured count, and the loop must TERMINATE (fixpoint or
          // detected 2-cycle) at both arms — an exit-on-cap would
          // silently shrink the normalizer.
          (lpaIterName,
            (s: SparkSession, dd: String) =>
              graft.operators.Lpa.iterate(
                graft.queries.LinkageQueries.coOrderPairs(s, s"$dd/tri"),
                loopParts = cpus.toInt),
            (s: SparkSession, dd: String) =>
              graft.operators.Lpa.iterate(
                graft.queries.LinkageQueries.coOrderPairs(s, s"$dd/tri"),
                loopParts = partsN)))
          .filter(t => wanted(t._1))
      }

      def measure(q: DedupQueries.Q, dir: String, parts: Int)
          : (Double, Metrics.TaskWork, Seq[org.apache.spark.sql.execution.SparkPlan]) = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        val t0 = System.nanoTime()
        val (_, work, plans) = Metrics.withTaskWorkPlans(spark) {
          val df = q(spark, dir)
          df.write.mode("overwrite").format("noop").save()
        }
        val wall = (System.nanoTime() - t0) / 1e9
        Sessions.releaseSnapshots()
        (wall, work, plans)
      }

      // Warm-up (JIT, codegen, parquet reader) so the 1× baseline isn't
      // cold-start; the gated quantities are record counts, which warm-up
      // cannot change, but clean context numbers are worth one cheap run.
      measure(queries.head._2, dir1, cpus.toInt)

      var allPass = true
      val entries = queries.map { case (name, q1, qN) =>
        val (w1, k1, plans1) = measure(q1, dir1, cpus.toInt)
        val rounds1 = graft.operators.Components.lastRounds
        val kmRounds1 = graft.operators.KMeans.lastRounds
        val kmConv1 = graft.operators.KMeans.lastConverged
        val prRounds1 = graft.operators.PageRank.lastRounds
        val prConv1 = graft.operators.PageRank.lastConverged
        val lpaRounds1 = graft.operators.Lpa.lastRounds
        val lpaTerm1 = graft.operators.Lpa.lastConverged ||
          graft.operators.Lpa.lastOscillating
        val bpeRounds1 = graft.operators.Bpe.lastRounds
        val (wN, kN, plansN) = measure(qN, dirN, partsN)
        val roundsN = graft.operators.Components.lastRounds
        val kmRoundsN = graft.operators.KMeans.lastRounds
        val kmConvN = graft.operators.KMeans.lastConverged
        val prRoundsN = graft.operators.PageRank.lastRounds
        val prConvN = graft.operators.PageRank.lastConverged
        val lpaRoundsN = graft.operators.Lpa.lastRounds
        val lpaTermN = graft.operators.Lpa.lastConverged ||
          graft.operators.Lpa.lastOscillating
        val bpeRoundsN = graft.operators.Bpe.lastRounds
        // Entries whose DECLARED plan carries bounded nested-loop joins
        // (the exact-allowlisted <= k-row broadcast cross joins: kmeans
        // centroid tables, dsir's scalar totals row) get the bounded
        // posture instead of the blanket no-nested-loop arm: no
        // CartesianProduct anywhere, and the BNLJ COUNT pinned equal at
        // both arms — a nested loop APPEARING at factor x that was not
        // in the 1x plan is exactly the regression the blanket arm
        // catches elsewhere.
        var planSane =
          boundedNested.get(name) match {
            case Some(expected) =>
              !Metrics.hasCartesian(plansN) &&
                Metrics.nestedLoopCount(plans1) == expected &&
                Metrics.nestedLoopCount(plansN) == expected
            // kmeans_lloyd's expected BNLJ count is rounds-dependent;
            // its entry block below REASSIGNS planSane with the
            // one-bounded-cross-per-round pin.
            case None if name == kmlName => !Metrics.hasCartesian(plansN)
            case None => !Metrics.hasNestedLoop(plansN)
          }
        val recRatio = kN.shuffleRecordsRead.toDouble / math.max(k1.shuffleRecordsRead, 1L)
        val joinRatio = kN.joinOutputRows.toDouble / math.max(k1.joinOutputRows, 1L)
        var recOk = kN.shuffleRecordsRead <=
          2L * factor * math.max(k1.shuffleRecordsRead, 10000L)
        var joinOk = kN.joinOutputRows <=
          2L * factor * math.max(k1.joinOutputRows, 10000L)
        // dedup_simhash_banded gates joinrows differently (round-10
        // measurement): its join output is POST-residual (the Hamming ≤ 4
        // check rides the join condition), so every join row is a TRUE
        // near-dup pair × its band multiplicity (≤ C(m,r)) — lower-bounded
        // by the fixture's real pair density. That density does not track
        // factor× here: SimHash Hamming distance is NOT invariant under
        // the per-copy word tagging (unlike Jaccard, which is invariant
        // under any injective token renaming — why the shingle entries sit
        // at ~1× linear): every copy re-draws its ~40-word vocabulary's
        // vote vectors, and near the ≤4 threshold the per-copy pair count
        // is heavy-tailed (measured per-copy quantiles at this corpus:
        // min 650 / median 3.8 k / max 27.7 k, CV 0.87, deterministic per
        // tag; the raw fixture's own draw is 1493 — a LOW draw). The flat
        // 2×-linear bound is therefore unsatisfiable by ANY correct
        // implementation: the 100× corpus truly CONTAINS ~3.9× the
        // linear-extrapolated pairs, all within-copy. The honest gates:
        //  (a) joinrows track the MEASURED true-output growth (join rows
        //      per result pair stay ≤ 2× flat — multiplicity, the only
        //      implementation-controlled factor, does not grow); and
        //  (b) ISOLATION: zero cross-copy result pairs — the sharp form
        //      of "key saturation mixed unrelated docs into the result",
        //      deterministic and draw-noise-free.
        // Bucket-saturation pressure itself stays gated by the records
        // arm (the band-table shuffle is the saturating structure) and
        // the in-join residual keeps the candidate superset from ever
        // materializing downstream.
        val extra = new StringBuilder
        var entryExtraOk = true
        // True when a custom, self-labelling joinrows/records gate (the
        // `joinrows_gate`/`records_gate` artifact fields) replaced the
        // flat 2×-linear bound; the floor-admission flag below must not
        // fire for those — their pass is explained by the recorded gate,
        // not the 10k floor.
        var customJoinGate = false
        var customRecGate = false
        if (name == "dedup_simhash_banded") {
          val res1 = q1(spark, dir1).count()
          Sessions.releaseSnapshots()
          val resDfN = qN(spark, dirN)
          // One pass over the result for all three isolation quantities:
          // total, cross-copy count, and the max Hamming in the result.
          val isoRow = resDfN.agg(count(lit(1)).as("n"),
            sum(when(call_function("div", col("doc_a"), lit(100000000L)) =!=
              call_function("div", col("doc_b"), lit(100000000L)), 1L)
              .otherwise(0L)).as("cross"),
            max(col("hamming")).as("maxham")).head
          val resN = isoRow.getLong(0)
          val cross = isoRow.getLong(1)
          val maxHamN = isoRow.getAs[Number](2).longValue // bit_count is int-typed
          Sessions.releaseSnapshots()
          val growth = resN.toDouble / math.max(res1, 1L)
          // The two arms now run DIFFERENT band parameterizations — the
          // declared (6,2) at 1×, the ladder's (m, r) at factor× — so
          // the gates normalize by the C(m,r)/C(6,2) band-multiplicity
          // the ladder step itself adds: band rows per doc and join rows
          // per true pair each scale by exactly that known constant.
          def comb(m: Int, r: Int): Long =
            ((m - r + 1) to m).map(_.toLong).product /
              (1 to r).map(_.toLong).product
          val (mN, rN) = DedupQueries.simhashBandedParamsFor(nDocs1 * factor)
          val bandRatio = comb(mN, rN).toDouble / comb(6, 2)
          recOk = kN.shuffleRecordsRead.toDouble <=
            2.0 * factor * bandRatio * math.max(k1.shuffleRecordsRead, 10000L)
          joinOk = kN.joinOutputRows.toDouble <=
            2.0 * growth * bandRatio * math.max(k1.joinOutputRows, 10000L)
          // Isolation, decade-honest form (round 14): the old cross == 0
          // gate was a fixture-STATISTICS canary — at 100× the expected
          // chance cross-copy Hamming ≤ 4 mass is ≪ 1 and the draw was
          // 0, but at 1000× (1.25e13 cross pairs) the expectation is
          // genuinely positive, and those pairs are TRUE results (the
          // per-copy word salting makes cross-copy signatures
          // independent draws, some of which land within Hamming 4 by
          // birthday statistics — measured at the first 1000× run). The
          // implementation-controlled failure the arm exists to catch is
          // a RESIDUAL regression: drop `hamming <= 4` from the join
          // condition and every coincidental cross-copy band-key
          // collision (~1.6e8 enumerated pairs at (8,4)·1000×) floods
          // the result. So the gates are (a) max Hamming in the result
          // ≤ 4 — the residual pinned directly, deterministic — and
          // (b) cross-copy pairs ≤ 1% of the result (chance mass is
          // ~1e-4 of it; a residual regression is ~30×).
          val isolation = maxHamN <= 4L && cross * 100L <= resN
          entryExtraOk = entryExtraOk && isolation
          extra ++= s""""result_1x":$res1,"result_${factor}x":$resN,"""
          extra ++= f""""result_growth":$growth%.2f,"cross_copy_pairs":$cross,"""
          extra ++= s""""max_hamming_${factor}x":$maxHamN,"""
          extra ++= s""""gate_isolation":$isolation,"""
          extra ++= s""""isolation_gate":"max_hamming<=4_and_cross_copy<=1pct_of_result","""
          extra ++= s""""m_r_1x":"(6,2)","m_r_${factor}x":"($mN,$rN)","""
          extra ++= f""""band_ratio":$bandRatio%.2f,"""
          extra ++= s""""records_gate":"records<=2x_linear_x_band_ratio","""
          extra ++= s""""joinrows_gate":"joinrows<=2x_true_result_growth_x_band_ratio","""
          customJoinGate = true
          customRecGate = true
        }
        // round 11: the fuzzy join's entry gate — the MaxBlock cap must
        // actually ENGAGE on the factor× Zipf block (ocN ≥ 1 over-cap
        // blocks, 0 at 1× where the hot block is still under cap), which
        // is what keeps the flat 2×-linear joinrows arm satisfiable at
        // all: uncapped, the hot block alone adds C(20·factor, 2) pairs.
        if (fuzzyNames.contains(name)) {
          // Block sizes in the query's OWN block space: last token for
          // the single-key form, the tagged last ∪ first union for the
          // multikey (its per-key spaces are disjoint by tag, so one
          // union count is exact).
          def overCap(dir: String): Long = {
            val names = spark.read.parquet(s"$dir/part.parquet")
              .groupBy("p_name").agg(count(lit(1)).as("cnt"))
            val keyed =
              if (name == fuzzyMultiName)
                names.select(concat_ws("#", lit("L"),
                    element_at(split(col("p_name"), " "), -1)).as("blk"))
                  .unionByName(names.select(concat_ws("#", lit("F"),
                    element_at(split(col("p_name"), " "), 1)).as("blk")))
              else
                names.select(element_at(split(col("p_name"), " "), -1).as("blk"))
            keyed.groupBy("blk").agg(count(lit(1)).as("bsz"))
              .filter(col("bsz") > graft.queries.LinkageQueries.MaxBlock)
              .count()
          }
          val oc1 = overCap(dir1)
          val ocN = overCap(dirN)
          // The hot block holds 20·factor names, so it crosses MaxBlock
          // only once factor > MaxBlock/20 — at the canonical factor 100
          // (2000 > 1000) the engagement is REQUIRED; a small-factor
          // smoke run (e.g. 10×, hot block 200) legitimately stays under
          // cap and must not fail this arm.
          val hotOver = 20L * factor > graft.queries.LinkageQueries.MaxBlock
          val capEngaged = oc1 == 0L && (!hotOver || ocN >= 1L)
          entryExtraOk = entryExtraOk && capEngaged
          extra ++= s""""overcap_blocks_1x":$oc1,"overcap_blocks_${factor}x":$ocN,"""
          extra ++= s""""gate_cap_engaged":$capEngaged,"""
        }
        // round 11: the inverted index's entry gate — the posting-row
        // bound held at factor× (max df_shard ≤ PostingShard), i.e. the
        // hot-term ObjectHashAggregate never materialized an unbounded
        // collect_list no matter how common the term.
        if (name == "text_inverted_index") {
          val mx = qN(spark, dirN)
            .agg(max(col("df_shard"))).head.getLong(0)
          Sessions.releaseSnapshots()
          val bounded = mx <= graft.queries.LinkageQueries.PostingShard
          entryExtraOk = entryExtraOk && bounded
          extra ++= s""""max_df_shard_${factor}x":$mx,"""
          extra ++= s""""gate_posting_bound":$bounded,"""
        }
        // dedup_clusters_raw normalizes its joinrows arm by the MEASURED
        // convergence rounds (round-10, from the first 1000× run failing
        // this arm at 2037.7× vs the flat 2000× bound): every CC round
        // re-joins the full edge set, so join output is rounds × O(edges),
        // and rounds track the MAX component diameter over the corpus —
        // O(log d) by pointer-jumping, but the max over factor×
        // independent per-copy candidate-graph draws (minhash signatures
        // re-draw under the per-copy word tagging) exceeds the single 1×
        // draw. The per-round join volume is the implementation-controlled
        // quantity, so the gates are: (a) joinrows ≤ 2× linear PER ROUND,
        // and (b) rounds grow at most additively by ⌈log₂ factor⌉ + 2 —
        // the max-of-draws bound for the geometric-tailed diameter
        // distribution; a propagation-only (non-doubling) regression
        // would blow (b) by orders, not units.
        if (Set("dedup_clusters_raw", "linkage_entity_clusters",
            "linkage_golden_record")(name) &&
            rounds1 > 0 && roundsN > 0) {
          val roundScale = roundsN.toDouble / rounds1
          joinOk = kN.joinOutputRows.toDouble <=
            2.0 * factor * roundScale * math.max(k1.joinOutputRows, 10000L)
          val roundsOk = roundsN <=
            rounds1 + math.ceil(math.log(factor) / math.log(2)).toInt + 2
          entryExtraOk = entryExtraOk && roundsOk
          extra ++= s""""rounds_1x":$rounds1,"rounds_${factor}x":$roundsN,"""
          extra ++= s""""gate_rounds":$roundsOk,"""
          extra ++= s""""joinrows_gate":"joinrows<=2x_linear_per_round","""
          customJoinGate = true
        }
        // round 13: bounded-BNLJ entries record both arms' nested-loop
        // counts (the pinned-equality gate is folded into planSane
        // above); dsir additionally gates that NO broadcast subtree
        // contains a documents scan at either arm — the recorded
        // join-side evidence round-12 verdict #1 asked for.
        boundedNested.get(name).foreach { expected =>
          val b1 = Metrics.nestedLoopCount(plans1)
          val bN = Metrics.nestedLoopCount(plansN)
          extra ++= s""""bnlj_1x":$b1,"bnlj_${factor}x":$bN,"bnlj_expected":$expected,"""
          extra ++= s""""plan_sane_gate":"no_cartesian_and_bnlj_count==expected_both_arms","""
        }
        if (name == "sample_dsir_weights") {
          val cb1 = Metrics.broadcastsContainingScan(plans1, "documents.parquet")
          val cbN = Metrics.broadcastsContainingScan(plansN, "documents.parquet")
          val noCorpusBroadcast = cb1 == 0 && cbN == 0
          entryExtraOk = entryExtraOk && noCorpusBroadcast
          extra ++= s""""corpus_broadcasts_1x":$cb1,"corpus_broadcasts_${factor}x":$cbN,"""
          extra ++= s""""gate_no_corpus_broadcast":$noCorpusBroadcast,"""
        }
        // round 14 (r13 verdict #1 done-criterion): the IVF×PQ scan in
        // isolation — snapshot the index (codes + per-probe scan table),
        // measure ONLY the ADC scan, and pin its join output to the
        // probed-cell mass: exactly 8 lookups per probed-cell candidate,
        // ≤ 2× for metric slack, and ≤ HALF the full-scan equivalent
        // (8 · |probes| · n — what sim_pq_adc_topk's unrouted scan pays).
        // With the fixture's 10 cells the measured mass sits near n/10
        // per probe; a regression that drops the cell key from the scan
        // join reverts to ~n per probe and fails both arms of the gate.
        if (name.startsWith("sim_ivfpq") && name != "sim_ivfpq_rerank_topk" &&
            name != "sim_ivfpq_drift_guard" && name != "sim_ivfpq_cell_stats" &&
            name != "sim_ivfpq_gc_stats") {
          def scanProbe(dir: String, parts: Int): (Long, Long, Long) = {
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            val (codes, scanTab) =
              if (name == "sim_ivfpq_residual_topk")
                SimilarityQueries.ivfpqResidualIndex(spark, dir)
              else if (name == "sim_ivfpq_trained_topk")
                SimilarityQueries.ivfpqTrainedIndex(spark, dir)
              else if (name == "sim_ivfpq_nprobe_topk")
                SimilarityQueries.ivfpqIndexNprobe(spark, dir, 2)
              else if (name == "sim_ivfpq_clustered_topk")
                (SimilarityQueries.ivfpqCodesTable(spark, dir),
                  SimilarityQueries.ivfpqIndex(spark, dir)._2)
              else if (name == "sim_ivfpq_full_trained_topk")
                SimilarityQueries.ivfpqFullTrainedIndex(spark, dir)
              else if (name == "sim_ivfpq_full_clustered_topk")
                (SimilarityQueries.ivfpqFullCodesTable(spark, dir),
                  SimilarityQueries.ivfpqFullTrainedIndex(spark, dir)._2)
              else if (name == "sim_ivfpq_append") {
                val (c, cellsT, cbT) =
                  SimilarityQueries.ivfpqAppendPersisted(spark, dir)
                (c, SimilarityQueries.ivfpqProbeTablesFrozen(
                  spark, dir, cellsT, cbT))
              }
              else if (name == "sim_ivfpq_delete_topk") {
                // The LIVE codes: full tombstone anti-join applied up
                // front, so the probed-cell mass bound below is the
                // post-delete one (the declared plan prunes the
                // tombstone fetch to the probed cells; for the snapshot
                // the unpruned anti is the same live set).
                val (c, cellsT, cbT) =
                  SimilarityQueries.ivfpqAppendPersisted(spark, dir)
                val tomb = SimilarityQueries.ivfpqTombstones(spark, dir)
                  .select(col("vec_id").as("t_id"), col("cell").as("t_cell"))
                val live = c.join(broadcast(tomb),
                  col("cell") === col("t_cell") &&
                    col("vec_id") === col("t_id"), "left_anti")
                (live, SimilarityQueries.ivfpqProbeTablesFrozen(
                  spark, dir, cellsT, cbT))
              }
              else if (name == "sim_ivfpq_append_nprobe") {
                val (c, cellsT, cbT) =
                  SimilarityQueries.ivfpqAppendPersisted(spark, dir)
                (c, SimilarityQueries.ivfpqProbeTablesFrozenNprobe(
                  spark, dir, cellsT, cbT, SimilarityQueries.AppendNprobe))
              }
              else if (name == "sim_ivfpq_compact_topk") {
                // The compacted generation IS the live set — no anti
                // anywhere; the probed-cell mass bound is the gc
                // table's own.
                val (_, cellsT, cbT) =
                  SimilarityQueries.ivfpqAppendPersisted(spark, dir)
                (SimilarityQueries.ivfpqCompactedCodes(spark, dir),
                  SimilarityQueries.ivfpqProbeTablesFrozen(
                    spark, dir, cellsT, cbT))
              }
              else if (name == "sim_ivfpq_cell_split") {
                val (c2, cells2) = SimilarityQueries.ivfpqSplitTables(spark, dir)
                val (_, _, cbT) =
                  SimilarityQueries.ivfpqAppendPersisted(spark, dir)
                (c2, SimilarityQueries.ivfpqProbeTablesFrozen(
                  spark, dir, cells2, cbT))
              }
              else SimilarityQueries.ivfpqIndex(spark, dir)
            val (cRdd, codesSnap) = Sessions.snapshot(codes)
            val (tRdd, tabSnap) = Sessions.snapshot(scanTab)
            val nVec = codesSnap.count() / 8 // materializes the snapshot
            tabSnap.count()
            val (_, work, _) = Metrics.withTaskWorkPlans(spark) {
              SimilarityQueries.ivfpqScan(codesSnap, tabSnap)
                .write.mode("overwrite").format("noop").save()
            }
            // Expected scan mass from the routed cells themselves:
            // 8 code rows per candidate in each probe's routed cell,
            // minus the probe's own rows when it lives in that cell.
            // Cell sizes and probe membership come from the CODES frame
            // (8 rows per vector), so the computation is identical for
            // label cells and trained (k-means) cells.
            val sizes = codesSnap.groupBy(col("cell")).agg(count(lit(1)).as("c8"))
              .collect().map(r => r.get(0).toString -> r.getLong(1) / 8).toMap
            val probeCell = codesSnap.filter(col("vec_id") < 5)
              .select(col("vec_id"), col("cell")).distinct().collect()
              .map(r => r.getLong(0) -> r.get(1).toString).toMap
            val routed = tabSnap.select(col("probe_id"), col("pcell")).distinct()
              .collect().map(r => (r.getLong(0), r.get(1).toString))
            // probeCell.get: a DELETED probe (the delete entry's vec 4)
            // owns no live codes, so it subtracts nothing anywhere.
            val expected = routed.map { case (p, c) =>
              8L * (sizes.getOrElse(c, 0L) -
                (if (probeCell.get(p).contains(c)) 1L else 0L)) }.sum
            // Denominator = what the UNROUTED scan pays: 8 lookups per
            // (probe, candidate) pair — per PROBE, not per routed cell,
            // so the nprobe = 2 entry is honestly compared against one
            // full scan, not two.
            val fullEquiv = 8L * routed.map(_._1).distinct.length * (nVec - 1)
            cRdd.unpersist(blocking = false)
            tRdd.unpersist(blocking = false)
            (work.joinOutputRows, expected, fullEquiv)
          }
          val (scan1, exp1, full1) = scanProbe(dir1, cpus.toInt)
          val (scanN, expN, fullN) = scanProbe(dirN, partsN)
          // The 10× smoke run measured scan == expected EXACTLY at both
          // arms (the join is deterministic and the metric counts its
          // output rows); 1.25× is headroom for metric semantics only.
          val scanOk = 4 * scan1 <= 5 * exp1 && 4 * scanN <= 5 * expN &&
            2 * scanN <= fullN
          entryExtraOk = entryExtraOk && scanOk
          extra ++= s""""scan_joinrows_1x":$scan1,"scan_expected_1x":$exp1,"""
          extra ++= s""""scan_joinrows_${factor}x":$scanN,"scan_expected_${factor}x":$expN,"""
          extra ++= s""""scan_fullscan_equiv_${factor}x":$fullN,"""
          extra ++= s""""gate_scan_cell_bounded":$scanOk,"""
          extra ++= s""""scan_gate":"isolated_scan_joinrows<=2x_probed_cell_mass_and<=half_full_scan","""
        }
        // round 14: the re-rank refine stage in isolation — snapshot the
        // ADC shortlist, measure ONLY the exact re-score, and pin its
        // join output CONSTANT across arms: two equi joins (fetch-by-id
        // + probe vectors) over a ≤ |probes|·R-row build side produce
        // exactly 2·|shortlist| rows at ANY corpus size. A regression
        // that lets the refine touch corpus-many raw vectors (e.g. the
        // rank filter slipping above the join) blows the constant bound
        // by the corpus factor.
        if (name == "sim_ivfpq_rerank_topk" ||
            name == "sim_ivfpq_full_trained_topk" ||
            name == "sim_ivfpq_full_clustered_topk" ||
            name == "sim_ivfpq_append" ||
            name == "sim_ivfpq_delete_topk" ||
            name == "sim_ivfpq_append_nprobe" ||
            name == "sim_ivfpq_compact_topk" ||
            name == "sim_ivfpq_cell_split") {
          def refineProbe(dir: String, parts: Int): (Long, Long) = {
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            val (codes, scanTab) =
              if (name == "sim_ivfpq_full_trained_topk")
                SimilarityQueries.ivfpqFullTrainedIndex(spark, dir)
              else if (name == "sim_ivfpq_full_clustered_topk")
                (SimilarityQueries.ivfpqFullCodesTable(spark, dir),
                  SimilarityQueries.ivfpqFullTrainedIndex(spark, dir)._2)
              else if (name == "sim_ivfpq_append") {
                val (c, cellsT, cbT) =
                  SimilarityQueries.ivfpqAppendPersisted(spark, dir)
                (c, SimilarityQueries.ivfpqProbeTablesFrozen(
                  spark, dir, cellsT, cbT))
              }
              else if (name == "sim_ivfpq_delete_topk") {
                val (c, cellsT, cbT) =
                  SimilarityQueries.ivfpqAppendPersisted(spark, dir)
                val tomb = SimilarityQueries.ivfpqTombstones(spark, dir)
                  .select(col("vec_id").as("t_id"), col("cell").as("t_cell"))
                val live = c.join(broadcast(tomb),
                  col("cell") === col("t_cell") &&
                    col("vec_id") === col("t_id"), "left_anti")
                (live, SimilarityQueries.ivfpqProbeTablesFrozen(
                  spark, dir, cellsT, cbT))
              }
              else if (name == "sim_ivfpq_append_nprobe") {
                val (c, cellsT, cbT) =
                  SimilarityQueries.ivfpqAppendPersisted(spark, dir)
                (c, SimilarityQueries.ivfpqProbeTablesFrozenNprobe(
                  spark, dir, cellsT, cbT, SimilarityQueries.AppendNprobe))
              }
              else if (name == "sim_ivfpq_compact_topk") {
                val (_, cellsT, cbT) =
                  SimilarityQueries.ivfpqAppendPersisted(spark, dir)
                (SimilarityQueries.ivfpqCompactedCodes(spark, dir),
                  SimilarityQueries.ivfpqProbeTablesFrozen(
                    spark, dir, cellsT, cbT))
              }
              else if (name == "sim_ivfpq_cell_split") {
                val (c2, cells2) = SimilarityQueries.ivfpqSplitTables(spark, dir)
                val (_, _, cbT) =
                  SimilarityQueries.ivfpqAppendPersisted(spark, dir)
                (c2, SimilarityQueries.ivfpqProbeTablesFrozen(
                  spark, dir, cells2, cbT))
              }
              else SimilarityQueries.ivfpqIndex(spark, dir)
            val (sRdd, shortSnap) = Sessions.snapshot(
              SimilarityQueries.ivfpqCandidates(codes, scanTab,
                SimilarityQueries.RerankShortlist))
            val nShort = shortSnap.count() // materializes the snapshot
            val (_, work, _) = Metrics.withTaskWorkPlans(spark) {
              SimilarityQueries.rerankRefine(spark, dir, shortSnap)
                .write.mode("overwrite").format("noop").save()
            }
            sRdd.unpersist(blocking = false)
            (work.joinOutputRows, nShort)
          }
          val (ref1, n1) = refineProbe(dir1, cpus.toInt)
          val (refN, nN) = refineProbe(dirN, partsN)
          val bound = 2L * 5 * SimilarityQueries.RerankShortlist
          val refineOk = ref1 == 2 * n1 && refN == 2 * nN &&
            refN <= bound && refN == ref1
          entryExtraOk = entryExtraOk && refineOk
          extra ++= s""""refine_joinrows_1x":$ref1,"shortlist_1x":$n1,"""
          extra ++= s""""refine_joinrows_${factor}x":$refN,"shortlist_${factor}x":$nN,"""
          extra ++= s""""refine_bound":$bound,"gate_refine_constant":$refineOk,"""
          extra ++= s""""refine_gate":"isolated_refine_joinrows==2x_shortlist_constant_across_arms","""
        }
        // round 17 (r16 verdict #1 done-criterion): ADMISSION in
        // isolation — the cost of admitting a delta batch into the
        // already-built index must be ∝ |delta|, never ∝ |corpus|.
        // With the artifacts pre-ensured (fixture setup), the measured
        // job is exactly the day-1 admission: encode the delta through
        // the frozen catalog artifacts. Its join output decomposes
        // analytically in |delta| ALONE — 8 rows/vector in the routing
        // cross (≤ 8 persisted cells), 1 in the centroid equi join,
        // 8·4 in the codebook equi join = 41·|delta| — so the gate is
        // joinrows ≤ 2× that bound at BOTH arms (a retrain regression
        // re-enters the corpus-scale Lloyd chain and blows it by
        // |corpus|/|delta| ≈ 10×); shuffle records (the two packed-min
        // aggregates' map-side-combined partials, ≤ 9·|delta|) get the
        // same |delta|-only form with a per-partition partial allowance.
        if (name == "sim_ivfpq_append") {
          def admitProbe(dir: String, parts: Int): (Long, Long, Long) = {
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            val (_, cellsT, cbT) =
              SimilarityQueries.ivfpqAppendPersisted(spark, dir)
            val delta = SimilarityQueries.appendDelta(
              graft.sources.Tables.embeddings(spark, dir))
            val nDelta = delta.count()
            val (_, work, _) = Metrics.withTaskWorkPlans(spark) {
              SimilarityQueries.ivfpqEncodeFrozen(delta, cellsT, cbT)
                .write.mode("overwrite").format("noop").save()
            }
            Sessions.releaseSnapshots()
            (work.joinOutputRows, work.shuffleRecordsRead, nDelta)
          }
          val (aj1, ar1, nd1) = admitProbe(dir1, cpus.toInt)
          val (ajN, arN, ndN) = admitProbe(dirN, partsN)
          val joinBound1 = 2L * 41L * nd1
          val joinBoundN = 2L * 41L * ndN
          val recBound1 = 2L * 9L * nd1 + 10L * cpus.toInt
          val recBoundN = 2L * 9L * ndN + 10L * partsN
          val admitOk = aj1 <= joinBound1 && ajN <= joinBoundN &&
            ar1 <= recBound1 && arN <= recBoundN
          entryExtraOk = entryExtraOk && admitOk
          extra ++= s""""admit_delta_1x":$nd1,"admit_joinrows_1x":$aj1,"""
          extra ++= s""""admit_records_1x":$ar1,"""
          extra ++= s""""admit_delta_${factor}x":$ndN,"admit_joinrows_${factor}x":$ajN,"""
          extra ++= s""""admit_records_${factor}x":$arN,"""
          extra ++= s""""admit_join_bound_${factor}x":$joinBoundN,"""
          extra ++= s""""admit_rec_bound_${factor}x":$recBoundN,"""
          extra ++= s""""gate_admission_delta_bounded":$admitOk,"""
          extra ++= s""""admission_gate":"isolated_delta_encode_joinrows<=2x41x|delta|_and_records<=2x9x|delta|+partials_both_arms","""
        }
        // round 18 (r17 verdict #1 done-criterion): DELETE-side work in
        // isolation — the cost of removing a deletion set from the
        // served index must be ∝ |deleted|, never ∝ |corpus|. The
        // measured job is the tombstone build: route the deleted
        // vectors through the frozen cell centroids (the training's own
        // assign — one |deleted|×(≤ 8 cells) bounded cross = 8·|deleted|
        // join rows, one packed-min aggregate ≤ |deleted| shuffle rows
        // with a per-partition partial allowance). A regression that
        // rebuilds instead (re-encoding the survivors) re-enters the
        // corpus-scale chain and blows the bound by |corpus|/|deleted|
        // ≈ 10×.
        if (name == "sim_ivfpq_delete_topk") {
          def tombProbe(dir: String, parts: Int): (Long, Long, Long) = {
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            val (_, cellsT, _) =
              SimilarityQueries.ivfpqAppendPersisted(spark, dir)
            val del = SimilarityQueries.deleteSet(
              graft.sources.Tables.embeddings(spark, dir))
            val nDel = del.count()
            import graft.operators.KMeans
            val (_, work, _) = Metrics.withTaskWorkPlans(spark) {
              KMeans.assign(KMeans.quantize(del), cellsT)
                .select(col("vec_id"), col("cluster").as("cell"))
                .write.mode("overwrite").format("noop").save()
            }
            Sessions.releaseSnapshots()
            (work.joinOutputRows, work.shuffleRecordsRead, nDel)
          }
          val (tj1, tr1, td1) = tombProbe(dir1, cpus.toInt)
          val (tjN, trN, tdN) = tombProbe(dirN, partsN)
          val tjBound1 = 2L * 8L * td1
          val tjBoundN = 2L * 8L * tdN
          val trBound1 = 2L * td1 + 10L * cpus.toInt
          val trBoundN = 2L * tdN + 10L * partsN
          val tombOk = tj1 <= tjBound1 && tjN <= tjBoundN &&
            tr1 <= trBound1 && trN <= trBoundN
          entryExtraOk = entryExtraOk && tombOk
          extra ++= s""""tomb_deleted_1x":$td1,"tomb_joinrows_1x":$tj1,"""
          extra ++= s""""tomb_records_1x":$tr1,"""
          extra ++= s""""tomb_deleted_${factor}x":$tdN,"tomb_joinrows_${factor}x":$tjN,"""
          extra ++= s""""tomb_records_${factor}x":$trN,"""
          extra ++= s""""tomb_join_bound_${factor}x":$tjBoundN,"""
          extra ++= s""""tomb_rec_bound_${factor}x":$trBoundN,"""
          extra ++= s""""gate_delete_deleted_bounded":$tombOk,"""
          extra ++= s""""delete_gate":"isolated_tombstone_build_joinrows<=2x8x|deleted|_and_records<=2x|deleted|+partials_both_arms","""
        }
        // round 18 (r17 verdict #3): the balance audit's join output is
        // the ≤ |cells|-row totals cross — CONSTANT across arms (cells
        // come from the frozen k = 8 seeds, not the corpus size).
        if (name == "sim_ivfpq_cell_stats") {
          val statsConst = k1.joinOutputRows == kN.joinOutputRows &&
            kN.joinOutputRows <= 16L
          entryExtraOk = entryExtraOk && statsConst
          extra ++= s""""gate_cellstats_constant":$statsConst,"""
          extra ++= s""""cellstats_gate":"joinrows_constant_<=|cells|_across_arms","""
        }
        // round 18: the gc audit's join output is the ≤ |cells|-row
        // stored⟕tombstone-counts broadcast join — CONSTANT across arms
        // (the cell_stats posture with one more bounded join).
        if (name == "sim_ivfpq_gc_stats") {
          val gcConst = k1.joinOutputRows == kN.joinOutputRows &&
            kN.joinOutputRows <= 16L
          entryExtraOk = entryExtraOk && gcConst
          extra ++= s""""gate_gcstats_constant":$gcConst,"""
          extra ++= s""""gcstats_gate":"joinrows_constant_<=|cells|_across_arms","""
        }
        // round 18: COMPACTION in isolation — the reclaim job (the
        // dynamic-partition-overwrite's input frame) must cost the
        // TOUCHED cells' mass, never more than the corpus and never the
        // quadratic anti-join a naive implementation pays. Join output
        // decomposes exactly: 8·M_t from the touched-cells semi +
        // 8·(M_t − D) from the tombstone anti = 16·M_t − 8·D (M_t =
        // vectors in tombstoned cells, D = |deleted|); shuffle records
        // are the tombstone-distinct's ≤ D rows plus partials. On this
        // uniform fixture the deletion residue touches every cell, so
        // M_t = n — the file-level locality (untouched partitions never
        // rewritten) is IvfpqMaintenanceSpec's dynamic-overwrite pin.
        if (name == "sim_ivfpq_compact_topk") {
          def reclaimProbe(dir: String, parts: Int): (Long, Long, Long, Long) = {
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            val (codes, _, _) =
              SimilarityQueries.ivfpqAppendPersisted(spark, dir)
            val tomb = SimilarityQueries.ivfpqTombstones(spark, dir)
            val nDel = tomb.count()
            val touched = tomb.select(col("cell").as("tc")).distinct()
            val mt = codes.filter(col("m") === 0L)
              .join(broadcast(touched), col("cell") === col("tc"), "left_semi")
              .count()
            val (_, work, _) = Metrics.withTaskWorkPlans(spark) {
              SimilarityQueries.ivfpqCompactLive(spark, dir)
                .write.mode("overwrite").format("noop").save()
            }
            Sessions.releaseSnapshots()
            (work.joinOutputRows, work.shuffleRecordsRead, mt, nDel)
          }
          val (cj1, cr1, mt1, d1) = reclaimProbe(dir1, cpus.toInt)
          val (cjN, crN, mtN, dN) = reclaimProbe(dirN, partsN)
          val cjExp1 = 16L * mt1 - 8L * d1
          val cjExpN = 16L * mtN - 8L * dN
          val crBound1 = 2L * d1 + 10L * cpus.toInt
          val crBoundN = 2L * dN + 10L * partsN
          val reclaimOk = cj1 <= 2L * cjExp1 && cjN <= 2L * cjExpN &&
            cr1 <= crBound1 && crN <= crBoundN
          entryExtraOk = entryExtraOk && reclaimOk
          extra ++= s""""reclaim_touched_mass_1x":$mt1,"reclaim_deleted_1x":$d1,"""
          extra ++= s""""reclaim_joinrows_1x":$cj1,"reclaim_expected_1x":$cjExp1,"""
          extra ++= s""""reclaim_records_1x":$cr1,"""
          extra ++= s""""reclaim_touched_mass_${factor}x":$mtN,"reclaim_deleted_${factor}x":$dN,"""
          extra ++= s""""reclaim_joinrows_${factor}x":$cjN,"reclaim_expected_${factor}x":$cjExpN,"""
          extra ++= s""""reclaim_records_${factor}x":$crN,"""
          extra ++= s""""gate_reclaim_touched_bounded":$reclaimOk,"""
          extra ++= s""""reclaim_gate":"isolated_reclaim_joinrows<=2x(16xMt-8xD)_and_records<=2xD+partials_both_arms","""
        }
        // round 18: the SPLIT in isolation — the measured job is the
        // member re-encode chain (2-means seeds/rounds + residual
        // re-encode through the frozen codebook). Its JOIN output is
        // |parent cell|-bounded exactly: the member semi (M) + the
        // member-vector fetch join (M — the reference's point-get
        // batch; with raw vectors cell-partitioned, the deployment
        // layout, this fetch prunes to the parent partition) + two
        // 2-means assign crosses (2M each) + the encode's child-assign
        // cross (2M), centroid join (M), and codebook join (32M) +
        // ≤ 16 rows of seed/children constants = 41·M + O(1). Shuffle
        // records carry the fetch's corpus-side sort-merge (≤ ~2·n
        // skinny rows — the one corpus-∝ term, the layout caveat above)
        // plus M-bounded aggregate partials.
        if (name == "sim_ivfpq_cell_split") {
          def splitProbe(dir: String, parts: Int): (Long, Long, Long, Long) = {
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            val (codes0, _, _) =
              SimilarityQueries.ivfpqAppendPersisted(spark, dir)
            val m = codes0.filter(col("m") === 0L)
              .groupBy(col("cell")).agg(count(lit(1)).as("n"))
              .agg(max(col("n"))).head.getLong(0)
            val n = codes0.count() / 8L
            val (_, work, _) = Metrics.withTaskWorkPlans(spark) {
              SimilarityQueries.ivfpqSplitBuild(spark, dir)._2
                .write.mode("overwrite").format("noop").save()
            }
            Sessions.releaseSnapshots()
            (work.joinOutputRows, work.shuffleRecordsRead, m, n)
          }
          val (sj1, sr1, m1, n1) = splitProbe(dir1, cpus.toInt)
          val (sjN, srN, mN, nN) = splitProbe(dirN, partsN)
          val sjBound1 = 2L * (41L * m1 + 16L)
          val sjBoundN = 2L * (41L * mN + 16L)
          val srBound1 = 2L * (2L * n1 + 12L * m1) + 10L * cpus.toInt
          val srBoundN = 2L * (2L * nN + 12L * mN) + 10L * partsN
          val splitOk = sj1 <= sjBound1 && sjN <= sjBoundN &&
            sr1 <= srBound1 && srN <= srBoundN
          entryExtraOk = entryExtraOk && splitOk
          extra ++= s""""split_members_1x":$m1,"split_joinrows_1x":$sj1,"""
          extra ++= s""""split_records_1x":$sr1,"""
          extra ++= s""""split_members_${factor}x":$mN,"split_joinrows_${factor}x":$sjN,"""
          extra ++= s""""split_records_${factor}x":$srN,"""
          extra ++= s""""split_join_bound_${factor}x":$sjBoundN,"""
          extra ++= s""""split_rec_bound_${factor}x":$srBoundN,"""
          extra ++= s""""gate_split_member_bounded":$splitOk,"""
          extra ++= s""""split_gate":"isolated_member_reencode_joinrows<=2x(41xM+16)_and_records<=2x(2n+12M)+partials_both_arms","""
        }
        // round 15 (r14 verdict #1): dedup_semdedup — the flat n×k
        // assignment cross join is GONE (two-level routing,
        // DedupQueries.semdedupRouted/semdedupAssignFrom: n·r to the
        // super seeds, then an EQUI join refining among the ≤ ~k/r
        // cells of the routed group), and the old structural n·k
        // accounting-identity gate is replaced by REAL per-level
        // bounds. Three custom arms over isolated stages:
        // (a) the level-2 refine join, measured against 2× the BALANCED
        //     n·⌈k/r⌉ + k·r bound — super-group skew past 2× FAILS
        //     (the join output is Σ_s n_s·k_s, a data property, not an
        //     identity);
        // (b) the within-cell candidate join (the quadratic-risk term
        //     the cells-∝-n dial bounds), gated ≤ 2× linear as before;
        // (c) qualifying pairs at the paper's τ = 0.95, now gated ≤ 2×
        //     linear TOO (r14 verdict #2: at τ = 0.95 the qualifying
        //     mass is the corpus's true near-dup rate — linear — not
        //     the τ = 0.3 isotropic ~n² tail that was context-only).
        // The whole-query joinrows gate sums ANALYTIC per-level bounds
        // (k·r + n·r + 2·n·⌈k/r⌉ + cand + n) — refine skew also fails
        // it, unlike r14's measured-n·k plug-in.
        if (name == "dedup_semdedup") {
          def pairProbe(dir: String, parts: Int,
                        k: Int): (Long, Long, Long, Long) = {
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            val routed = Sessions.snapshot(
              DedupQueries.semdedupRouted(k)(spark, s"$dir/semdd"))._2
            routed.count() // materialize level 1
            val groups = DedupQueries.semdedupCellGroups(k)(spark, s"$dir/semdd")
            val (_, workA, _) = Metrics.withTaskWorkPlans(spark) {
              DedupQueries.semdedupAssignFrom(routed, groups, k)
                .write.mode("overwrite").format("noop").save()
            }
            val asn = Sessions.snapshot(
              DedupQueries.semdedupAssignFrom(routed, groups, k))._2
            val nVec = asn.count() // materializes the assigned snapshot
            val (_, workC, _) = Metrics.withTaskWorkPlans(spark) {
              DedupQueries.semdedupCandidates(asn)
                .write.mode("overwrite").format("noop").save()
            }
            val (_, workQ, _) = Metrics.withTaskWorkPlans(spark) {
              DedupQueries.semdedupLosers(asn)
                .write.mode("overwrite").format("noop").save()
            }
            Sessions.releaseSnapshots()
            (workA.joinOutputRows, workC.joinOutputRows,
              workQ.joinOutputRows, nVec)
          }
          val k1c = DedupQueries.SemdedupCells
          val kNc = DedupQueries.SemdedupCells * factor
          val r1c = DedupQueries.semdedupSupers(k1c)
          val rNc = DedupQueries.semdedupSupers(kNc)
          val (ref1, cand1, qual1, n1) = pairProbe(dir1, cpus.toInt, k1c)
          val (refN, candN, qualN, nN) = pairProbe(dirN, partsN, kNc)
          // (a) level-2 refine: measured Σ_s n_s·k_s vs the balanced
          // bound (+ the k×r level-0 cross inside the same job).
          def refBound(n: Long, k: Int, r: Int): Long =
            2L * (n * ((k + r - 1) / r) + k.toLong * r)
          val refineOk = ref1 <= refBound(n1, k1c, r1c) &&
            refN <= refBound(nN, kNc, rNc)
          // (b) candidate mass ≤ 2× linear under the cells dial.
          val candOk = candN <= 2L * factor * math.max(cand1, 10000L)
          // (c) qualifying pairs ≤ 2× linear at τ = 0.95 (floor 1000:
          // the isotropic fixture has ~zero true near-dups, so the
          // gate's teeth are "stays ~zero", not a ratio on noise).
          val qualOk = qualN <= 2L * factor * math.max(qual1, 1000L)
          // Whole-query joinrows vs the analytic per-level sum.
          def expect(n: Long, k: Int, r: Int, cand: Long): Long =
            k.toLong * r + n * r + 2L * n * ((k + r - 1) / r) + cand + n
          val expect1 = expect(n1, k1c, r1c, cand1)
          val expectN = expect(nN, kNc, rNc, candN)
          joinOk = k1.joinOutputRows <= 2L * expect1 &&
            kN.joinOutputRows <= 2L * expectN
          customJoinGate = true
          entryExtraOk = entryExtraOk && refineOk && candOk && qualOk
          extra ++= s""""cells_1x":$k1c,"cells_${factor}x":$kNc,"""
          extra ++= s""""supers_1x":$r1c,"supers_${factor}x":$rNc,"""
          extra ++= s""""refine_joinrows_1x":$ref1,"refine_bound_1x":${refBound(n1, k1c, r1c)},"""
          extra ++= s""""refine_joinrows_${factor}x":$refN,"refine_bound_${factor}x":${refBound(nN, kNc, rNc)},"""
          extra ++= s""""gate_refine_balanced":$refineOk,"""
          extra ++= s""""refine_gate":"isolated_level2_joinrows<=2x_(n_ceil(k_over_r)+k_r)_balance","""
          extra ++= s""""cand_joinrows_1x":$cand1,"cand_joinrows_${factor}x":$candN,"""
          extra ++= s""""gate_cand_linear":$candOk,"""
          extra ++= s""""cand_gate":"isolated_candidate_joinrows<=2x_linear","""
          extra ++= s""""qual_pairs_1x":$qual1,"qual_pairs_${factor}x":$qualN,"""
          extra ++= s""""gate_qual_linear":$qualOk,"""
          extra ++= s""""qual_gate":"qualifying_pairs<=2x_linear_at_paper_tau","""
          extra ++= s""""join_expected_1x":$expect1,"join_expected_${factor}x":$expectN,"""
          extra ++= s""""joinrows_gate":"joinrows<=2x_(k_r+n_r+2n_ceil(k_over_r)+cand+n)_analytic","""
        }
        // round 14 (r13 verdict #4): kmeans_lloyd normalizes by MEASURED
        // rounds — every round re-scans the corpus once (assign+update
        // collapsed into the round's one action), so records/joinrows
        // are rounds × O(n); rounds grow ~log₂ chain extent on this
        // fixture (the planted property), bounded additively like the
        // CC entry. Plan pin: exactly ONE bounded broadcast cross join
        // per round (the ≤ k-row centroid table), no Cartesian, and the
        // loop must actually CONVERGE at both arms (an exit-on-cap would
        // silently cap the normalizer).
        if (name == prIterName && prRounds1 > 0 && prRoundsN > 0) {
          val roundScale = prRoundsN.toDouble / prRounds1
          recOk = kN.shuffleRecordsRead.toDouble <=
            2.0 * factor * roundScale * math.max(k1.shuffleRecordsRead, 10000L)
          joinOk = kN.joinOutputRows.toDouble <=
            2.0 * factor * roundScale * math.max(k1.joinOutputRows, 10000L)
          customRecGate = true
          customJoinGate = true
          // The contraction bound: rounds-to-tol depend on damping and
          // tol only; +2 absorbs integer-floor wobble near the fixpoint.
          val roundsOk = prRoundsN <= prRounds1 + 2
          entryExtraOk = entryExtraOk && roundsOk && prConv1 && prConvN
          extra ++= s""""rounds_1x":$prRounds1,"rounds_${factor}x":$prRoundsN,"""
          extra ++= s""""converged_1x":$prConv1,"converged_${factor}x":$prConvN,"""
          extra ++= s""""gate_rounds":$roundsOk,"""
          extra ++= s""""records_gate":"records<=2x_linear_per_round","""
          extra ++= s""""joinrows_gate":"joinrows<=2x_linear_per_round","""
        }
        // round 16: the BPE trainer loop — rounds must hit the full
        // target at BOTH arms (the salted corpora keep ≥ minCount pair
        // mass at every rung; an early stop would shrink the
        // normalizer), and records/joinrows normalize by them.
        if (name == "bpe_train_loop" && bpeRounds1 > 0 && bpeRoundsN > 0) {
          val roundScale = bpeRoundsN.toDouble / bpeRounds1
          recOk = kN.shuffleRecordsRead.toDouble <=
            2.0 * factor * roundScale * math.max(k1.shuffleRecordsRead, 10000L)
          joinOk = kN.joinOutputRows.toDouble <=
            2.0 * factor * roundScale * math.max(k1.joinOutputRows, 10000L)
          customRecGate = true
          customJoinGate = true
          val target = graft.queries.TextQueries.BpeMerges
          val roundsOk = bpeRounds1 == target && bpeRoundsN == target
          entryExtraOk = entryExtraOk && roundsOk
          extra ++= s""""rounds_1x":$bpeRounds1,"rounds_${factor}x":$bpeRoundsN,"""
          extra ++= s""""target_merges":$target,"gate_rounds":$roundsOk,"""
          extra ++= s""""records_gate":"records<=2x_linear_per_round","""
          extra ++= s""""joinrows_gate":"joinrows<=2x_linear_per_round","""
        }
        // round 16: the LPA termination loop — the pagerank_iterate
        // posture: records/joinrows normalize by measured rounds, rounds
        // FLAT across arms (disjoint identical copies → identical
        // per-copy community trajectories), and both arms must TERMINATE
        // on a detected condition (fixpoint or 2-cycle), never the cap.
        if (name == lpaIterName && lpaRounds1 > 0 && lpaRoundsN > 0) {
          val roundScale = lpaRoundsN.toDouble / lpaRounds1
          recOk = kN.shuffleRecordsRead.toDouble <=
            2.0 * factor * roundScale * math.max(k1.shuffleRecordsRead, 10000L)
          joinOk = kN.joinOutputRows.toDouble <=
            2.0 * factor * roundScale * math.max(k1.joinOutputRows, 10000L)
          customRecGate = true
          customJoinGate = true
          val roundsOk = lpaRoundsN <= lpaRounds1 + 2
          entryExtraOk = entryExtraOk && roundsOk && lpaTerm1 && lpaTermN
          extra ++= s""""rounds_1x":$lpaRounds1,"rounds_${factor}x":$lpaRoundsN,"""
          extra ++= s""""terminated_1x":$lpaTerm1,"terminated_${factor}x":$lpaTermN,"""
          extra ++= s""""gate_rounds":$roundsOk,"""
          extra ++= s""""records_gate":"records<=2x_linear_per_round","""
          extra ++= s""""joinrows_gate":"joinrows<=2x_linear_per_round","""
        }
        if (name == kmlName && kmRounds1 > 0 && kmRoundsN > 0) {
          val roundScale = kmRoundsN.toDouble / kmRounds1
          recOk = kN.shuffleRecordsRead.toDouble <=
            2.0 * factor * roundScale * math.max(k1.shuffleRecordsRead, 10000L)
          joinOk = kN.joinOutputRows.toDouble <=
            2.0 * factor * roundScale * math.max(k1.joinOutputRows, 10000L)
          customRecGate = true
          customJoinGate = true
          val roundsOk = kmRoundsN <=
            kmRounds1 + math.ceil(math.log(factor) / math.log(2)).toInt + 2
          val b1 = Metrics.nestedLoopCount(plans1)
          val bN = Metrics.nestedLoopCount(plansN)
          planSane = !Metrics.hasCartesian(plans1) &&
            !Metrics.hasCartesian(plansN) &&
            b1 == kmRounds1 && bN == kmRoundsN
          entryExtraOk = entryExtraOk && roundsOk && kmConv1 && kmConvN
          extra ++= s""""rounds_1x":$kmRounds1,"rounds_${factor}x":$kmRoundsN,"""
          extra ++= s""""converged_1x":$kmConv1,"converged_${factor}x":$kmConvN,"""
          extra ++= s""""bnlj_1x":$b1,"bnlj_${factor}x":$bN,"""
          extra ++= s""""gate_rounds":$roundsOk,"""
          extra ++= s""""records_gate":"records<=2x_linear_per_round","""
          extra ++= s""""joinrows_gate":"joinrows<=2x_linear_per_round","""
          extra ++= s""""plan_sane_gate":"no_cartesian_and_one_bounded_cross_per_round","""
        }
        // Floor-admission flag (round-6 ADVICE): true when the pass rode
        // the 10k-record floor rather than 2×-linear growth of the
        // query's own 1× baseline.
        val floorAdmitted =
          (!customRecGate && recOk &&
            kN.shuffleRecordsRead > 2L * factor * k1.shuffleRecordsRead) ||
          (!customJoinGate && joinOk &&
            kN.joinOutputRows > 2L * factor * k1.joinOutputRows)
        // Factor-aware: a LINEAR operator's spill grows ~factor× once the
        // data outgrows executor memory, so the bound is 2.5× linear (the
        // same headroom ScaleProbeSpec's 25× gives factor 10), with a
        // 64 MB floor so a zero-spill 1× baseline can't make any 100×
        // spill a failure. A spill-bound quadratic overshoots this by
        // ~factor×.
        val spillOk = kN.diskSpilledBytes <=
          (5L * factor / 2) * math.max(k1.diskSpilledBytes, 64L * 1024 * 1024)
        val pass = recOk && joinOk && spillOk && planSane && entryExtraOk
        allPass &= pass
        println(f"[volprobe] $name: 1x shufrec=${k1.shuffleRecordsRead} " +
          f"${factor}x shufrec=${kN.shuffleRecordsRead} (ratio $recRatio%.1f, " +
          f"linear=$factor) joinrows=${k1.joinOutputRows}→${kN.joinOutputRows} " +
          f"(ratio $joinRatio%.1f) spill=${kN.diskSpilledBytes / 1e6}%.0f MB " +
          f"planSane=$planSane floorAdmitted=$floorAdmitted pass=$pass " +
          f"[context: wall $w1%.2f→$wN%.2f s, cpu ${k1.cpuSec}%.2f→${kN.cpuSec}%.2f s]")
        s"${Jsons.q(name)}:{" + extra.toString +
          s""""shufrec_1x":${k1.shuffleRecordsRead},"shufrec_${factor}x":${kN.shuffleRecordsRead},""" +
          f""""shufrec_ratio":$recRatio%.2f,""" +
          s""""joinrows_1x":${k1.joinOutputRows},"joinrows_${factor}x":${kN.joinOutputRows},""" +
          f""""joinrows_ratio":$joinRatio%.2f,"spill_1x":${k1.diskSpilledBytes},""" +
          s""""spill_${factor}x":${kN.diskSpilledBytes},"plan_sane":$planSane,""" +
          f""""wall_1x":$w1%.3f,"wall_${factor}x":$wN%.3f,""" +
          f""""cpu_1x":${k1.cpuSec}%.3f,"cpu_${factor}x":${kN.cpuSec}%.3f,""" +
          s""""gate_records":$recOk,"gate_joinrows":$joinOk,"gate_spill":$spillOk,""" +
          s""""floor_admitted":$floorAdmitted,""" +
          s""""metrics_incomplete":${k1.incomplete || kN.incomplete},"pass":$pass}"""
      }
      val json = s"""{"probe":"volume","factor":$factor,"sf":${Jsons.q(sf)},""" +
        s""""gate":"shuffle_records<=2x_linear AND join_output_rows<=2x_linear AND spill_bounded AND plan_sane",""" +
        s""""timing_is_context_only":true,""" +
        s""""queries":{${entries.mkString(",")}},"all_pass":$allPass}"""
      Files.write(java.nio.file.Paths.get(out),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(json)
      if (!allPass) exitCode = 1
    } finally {
      rmTree(dir1)
      rmTree(dirN)
      spark.stop()
    }
    if (exitCode != 0) sys.exit(exitCode)
  }
}
