package graft

import java.nio.file.Files

import graft.queries.DedupQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{Metrics, Sessions}

/** One-shot 100× VOLUME probe for the flagship dedup composition
  * (VERDICT r4 #5 / r5 next #3): minhash-capped candidates →
  * jaccard-on-lsh rescoring → raw connected-component labels, measured at
  * 1× and SPARK_GRAFT_VOL_FACTOR× (default 100×) the sf0.1 corpus.
  *
  * ScaleProbeSpec's 10× gate runs every build; this main exists because a
  * single 100× point is the strongest linearity evidence this host can
  * produce — IF the gate is host-noise-free. So only the VOLUME gate from
  * ScaleProbeSpec applies here: shuffle-records-read ratio ≤ 2× linear
  * (≤ 2·factor), disk spill bounded, and no nested-loop join in the
  * measured plan. Shuffle-record counts and plan shape are properties of
  * the PLAN, not the VM — this box's documented stall episodes inflate
  * wall 10-30× and even thread-CPU time (memory stalls are on-CPU), which
  * is exactly why wall/cpu are RECORDED in the artifact for context but
  * never gated on. A hot-key quadratic writes ~factor²× join-output
  * records; an in-stage all-pairs regression shows up as a
  * BroadcastNestedLoopJoin/CartesianProduct node.
  *
  * The 100× corpus uses the same per-copy word salting as ScaleProbeSpec
  * (offset doc_ids, every word tagged per copy): intra-copy near-dup
  * structure is preserved exactly while cross-copy shingle collisions are
  * impossible, so candidate volume grows ~factor×, not factor²× as naive
  * duplication would force on a perfectly linear operator.
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
  * Emits one JSON artifact (SPARK_GRAFT_VOL_OUT, default
  * VOLPROBE_r06.json in the working dir) with per-query raw numbers,
  * ratios, and gate results; exits non-zero if any gate fails.
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
    val out = sys.env.getOrElse("SPARK_GRAFT_VOL_OUT", "VOLPROBE_r06.json")
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

    val dir1 = Files.createTempDirectory("graft-vol1").toString
    val dirN = Files.createTempDirectory(s"graft-vol$factor").toString
    try {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      docs.write.mode("overwrite").parquet(s"$dir1/documents.parquet")
      def salted(tag: Int): DataFrame = docs.select(
        (col("doc_id") + tag * 100000000L).as("doc_id"),
        concat_ws(" ",
          transform(split(col("text"), " "), w => concat(w, lit(s"q$tag")))).as("text"),
        col("lang"), col("source"), col("n_chars"))
      (0 until factor).map(salted).reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dirN/documents.parquet")

      val queries: Seq[(String, DedupQueries.Q)] = Seq(
        "dedup_minhash_capped" -> DedupQueries.dedupMinhashCapped,
        "dedup_jaccard_on_lsh" -> DedupQueries.dedupJaccardOnLsh,
        "dedup_clusters_raw" -> DedupQueries.dedupClustersRaw,
        // The two other heavy declared dedup plans: the df-capped exact
        // shingle self-join (word salting preserves each shingle's
        // document frequency, so the df≤64 cap drops the same shingle
        // universe at every factor) and the span-profiling equi-join.
        "dedup_ngram_jaccard_capped" -> DedupQueries.dedupNgramJaccardCapped,
        "text_dup_span_ratio" -> graft.queries.TextQueries.textDupSpanRatio,
        // Span REMOVAL: the token-level anti join is the heaviest shuffle
        // shape in the surface (every token moves once) — exactly the
        // plan whose 100x linearity needs a recorded data point.
        "text_dedup_spans" -> graft.queries.TextQueries.textDedupSpans)

      def measure(q: DedupQueries.Q, dir: String): (Double, Metrics.TaskWork, Boolean) = {
        val t0 = System.nanoTime()
        var df: DataFrame = null
        val (_, work) = Metrics.withTaskWork(spark.sparkContext) {
          df = q(spark, dir)
          df.write.mode("overwrite").format("noop").save()
        }
        val wall = (System.nanoTime() - t0) / 1e9
        Sessions.releaseSnapshots()
        val plan = df.queryExecution.sparkPlan.toString
        (wall, work,
          !plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
      }

      // Warm-up (JIT, codegen, parquet reader) so the 1× baseline isn't
      // cold-start; the gated quantities are record counts, which warm-up
      // cannot change, but clean context numbers are worth one cheap run.
      measure(queries.head._2, dir1)

      var allPass = true
      val entries = queries.map { case (name, q) =>
        val (w1, k1, _) = measure(q, dir1)
        val (wN, kN, planSane) = measure(q, dirN)
        val recRatio = kN.shuffleRecordsRead.toDouble / math.max(k1.shuffleRecordsRead, 1L)
        val recOk = kN.shuffleRecordsRead <=
          2L * factor * math.max(k1.shuffleRecordsRead, 10000L)
        // Factor-aware: a LINEAR operator's spill grows ~factor× once the
        // data outgrows executor memory, so the bound is 2.5× linear (the
        // same headroom ScaleProbeSpec's 25× gives factor 10), with a
        // 64 MB floor so a zero-spill 1× baseline can't make any 100×
        // spill a failure. A spill-bound quadratic overshoots this by
        // ~factor×.
        val spillOk = kN.diskSpilledBytes <=
          (5L * factor / 2) * math.max(k1.diskSpilledBytes, 64L * 1024 * 1024)
        val pass = recOk && spillOk && planSane
        allPass &= pass
        println(f"[volprobe] $name: 1x shufrec=${k1.shuffleRecordsRead} " +
          f"${factor}x shufrec=${kN.shuffleRecordsRead} (ratio $recRatio%.1f, " +
          f"linear=$factor) spill=${kN.diskSpilledBytes / 1e6}%.0f MB " +
          f"planSane=$planSane pass=$pass " +
          f"[context: wall $w1%.2f→$wN%.2f s, cpu ${k1.cpuSec}%.2f→${kN.cpuSec}%.2f s]")
        s"${Jsons.q(name)}:{" +
          s""""shufrec_1x":${k1.shuffleRecordsRead},"shufrec_${factor}x":${kN.shuffleRecordsRead},""" +
          f""""shufrec_ratio":$recRatio%.2f,"spill_1x":${k1.diskSpilledBytes},""" +
          s""""spill_${factor}x":${kN.diskSpilledBytes},"plan_sane":$planSane,""" +
          f""""wall_1x":$w1%.3f,"wall_${factor}x":$wN%.3f,""" +
          f""""cpu_1x":${k1.cpuSec}%.3f,"cpu_${factor}x":${kN.cpuSec}%.3f,""" +
          s""""gate_records":$recOk,"gate_spill":$spillOk,"pass":$pass}"""
      }
      val json = s"""{"probe":"volume","factor":$factor,"sf":${Jsons.q(sf)},""" +
        s""""gate":"shuffle_records<=2x_linear AND spill_bounded AND plan_sane",""" +
        s""""timing_is_context_only":true,""" +
        s""""queries":{${entries.mkString(",")}},"all_pass":$allPass}"""
      Files.write(java.nio.file.Paths.get(out),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(json)
      if (!allPass) sys.exit(1)
    } finally {
      rmTree(dir1)
      rmTree(dirN)
      spark.stop()
    }
  }
}
