package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._

/** Convergence tests for the N-round Lloyd driver loop (round-12 verdict
  * #7) — a PLANTED corpus whose fixpoint and round count are known in
  * closed form, plus the structural tie to the declared oracle instance:
  * `emb_kmeans` runs exactly two rounds of the same assign/update blocks,
  * so on a corpus that converges in ≤ 2 rounds the two must agree row for
  * row.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** 64-dim embedding rows varying only in dim 0 (the 1-D planted line);
    * values are millunit-exact (multiples of 0.001) so quantization is
    * lossless and the expected fixed-point centroids are computable by
    * hand. */
  private def planted(rows: Seq[(Long, Double)]) =
    rows.toDF("vec_id", "x")
      .select(col("vec_id"),
        concat(array(col("x").cast("float")),
          array_repeat(lit(0.0f), 63)).as("embedding"))

  test("two well-separated blobs converge to exact prototype means") {
    // Init centroids are vec_id < 2: vec 0 at x=0.0 and vec 1 at x=0.1.
    // Points: {0.0, 0.002, 0.004} near zero, {10.0, 10.002} far away.
    // The 3-round trajectory is known in closed form:
    //  round 1: vec 1 (x=0.1) sits ON centroid 1, so it captures the far
    //    blob too (10.0 is closer to 0.1 than to 0.0) — cluster 1 =
    //    {0.1, 10.0, 10.002}, cluster 0 = {0.0, 0.002, 0.004}; the
    //    update drags centroid 1 to ~6.70;
    //  round 2: vec 1 is now far closer to centroid 0 (~0.002) than to
    //    6.70 — it MIGRATES; clusters settle at {0, 0.002, 0.004, 0.1}
    //    and {10.0, 10.002}, centroids at their floor-means;
    //  round 3: assignment is stable, the re-derived table is identical,
    //    convergence observed.
    val emb = planted(Seq(
      0L -> 0.0, 1L -> 0.1,
      2L -> 0.002, 3L -> 0.004,
      4L -> 10.0, 5L -> 10.002))
    val out = KMeans.lloyd(emb, k = 2, loopParts = 3).collect()
    assert(KMeans.lastConverged, "planted blobs must reach the fixpoint")
    assert(KMeans.lastRounds == 3, s"expected 3 rounds, got ${KMeans.lastRounds}")
    val byCluster = out.groupBy(_.getLong(0))
    assert(byCluster.keySet == Set(0L, 1L))
    // Micro-unit fixed-point means: cluster 0 = {0, 2, 4, 100} millunits
    // → 106000/4 = 26500 exactly; cluster 1 = {10000, 10002} →
    // 20002000/2 = 10001000.
    val a = byCluster(0L).sortBy(_.getLong(1))
    val b = byCluster(1L).sortBy(_.getLong(1))
    assert(a.head.getLong(2) == 26500L && a.forall(_.getLong(3) == 4L))
    assert(b.head.getLong(2) == 10001000L && b.forall(_.getLong(3) == 2L))
    // Dims 1..63 are all-zero in the corpus, so every fixpoint centroid
    // coordinate beyond dim 0 is exactly 0.
    assert(a.tail.forall(_.getLong(2) == 0L) && b.tail.forall(_.getLong(2) == 0L))
  }

  test("round budget caps a non-converged run and records it") {
    val emb = planted(Seq(
      0L -> 0.0, 1L -> 0.1,
      2L -> 0.002, 3L -> 0.004,
      4L -> 10.0, 5L -> 10.002))
    KMeans.lloyd(emb, k = 2, loopParts = 3, maxRounds = 1).collect()
    assert(!KMeans.lastConverged && KMeans.lastRounds == 1)
  }

  test("lloyd fixpoint equals the declared 2-round emb_kmeans on a <=2-round corpus") {
    // The real sf0.001 embeddings need more than 2 rounds, so the tie is
    // pinned on the planted corpus where 2 rounds ARE the fixpoint: the
    // declared query's output (same k, same init convention) must equal
    // lloyd's converged table bit for bit. Drive the declared query via
    // a temp parquet dir shaped like the fixture.
    val emb = planted(Seq(
      0L -> 0.0, 1L -> 0.1,
      2L -> 0.002, 3L -> 0.004,
      4L -> 10.0, 5L -> 10.002))
      .withColumn("label", lit("t"))
    val dir = java.nio.file.Files.createTempDirectory("graft-kmeans").toString
    try {
      emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val declared = graft.queries.SimilarityQueries.embKmeans(spark, dir)
        .collect().map(_.toSeq)
      org.apache.spark.sql.graftx.Sessions.releaseSnapshots()
      val loop = KMeans.lloyd(
        spark.read.parquet(s"$dir/embeddings.parquet"), k = 8, loopParts = 3)
        .collect().map(_.toSeq)
      // k = 8 over 6 points: init clusters are the ids < 8 present (all
      // six), every point is its own nearest centroid at round 1 except
      // the merges Lloyd itself performs — whatever the trajectory, the
      // CONTRACT is declared(2 rounds) == lloyd's table after 2 rounds,
      // and this corpus converges by then.
      assert(KMeans.lastConverged)
      assert(declared.toSeq == loop.toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
  }
}
