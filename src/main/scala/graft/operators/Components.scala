package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by Pregel-style min-label propagation
  * — the operator behind `dedup_clusters` (each near-dup pair component
  * collapses to its min doc_id, the canonical representative), factored
  * out so specs can drive it on arbitrary graphs.
  *
  * Design notes earned the hard way (see DedupQueries history):
  *  - one propagation step is a SINGLE join+groupBy over self-looped
  *    edges (rep'(v) = min rep over N(v) ∪ {v}) so the label frame
  *    appears exactly once per step — a step shaped "labels ⋈ f(labels)"
  *    duplicates the label subtree and k lazy steps execute 2^k copies;
  *  - steps compose LAZILY in blocks with one materializing action per
  *    block (per-step actions are almost pure job-scheduling overhead on
  *    small graphs);
  *  - the fixpoint test compares the block's LAST TWO steps (cur = F(prev),
  *    so cur == prev proves the fixpoint) with name-unique columns —
  *    alias-qualified resolution across a frame and its own derivative is
  *    ambiguous and silently broke;
  *  - AQE materializes every Exchange as its own scheduled query stage
  *    (~0.5 s of scheduling per shuffle with nothing to adapt on a tiny
  *    graph), so it is scoped off for the loop's actions only;
  *  - non-convergence within the cap THROWS — wrong labels must never
  *    ship silently.
  */
object Components {

  /** @param pairs      (doc_a, doc_b) undirected candidate pairs
    * @param loopParts  shuffle width for the iterative stage (size to the
    *                   edge volume; a handful for small graphs)
    * @param blockSteps lazy propagation steps per materializing action
    * @param maxBlocks  cap: supports diameters up to blockSteps×maxBlocks−1
    * @return (doc_id, cluster_rep) for every vertex of the pair graph */
  def connectedComponents(pairs: DataFrame, loopParts: Int,
                          blockSteps: Int = 5, maxBlocks: Int = 5): DataFrame = {
    val s = pairs.sparkSession
    val undirected = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val verts = undirected.select(col("src").as("v")).distinct()
    val edges = undirected
      .union(verts.select(col("v").as("src"), col("v").as("dst")))
      .repartition(loopParts, col("dst"))
      .persist()
    var labels = verts.select(col("v"), col("v").as("rep"))
      .repartition(loopParts, col("v"))
    var persisted: Option[DataFrame] = None
    var block = 0
    var converged = false
    val aqeWas = s.conf.get("spark.sql.adaptive.enabled", "true")
    val partsWas = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    try {
      while (block < maxBlocks && !converged) {
        var prev = labels
        var cur = labels
        for (_ <- 0 until blockSteps) {
          prev = cur
          cur = edges.join(cur, col("dst") === col("v"))
            .groupBy(col("src")).agg(min(col("rep")).as("rep"))
            .select(col("src").as("v"), col("rep"))
        }
        val next = cur.persist()
        val changed = next.join(
            prev.select(col("v").as("pv"), col("rep").as("prev_rep")),
            col("v") === col("pv"))
          .filter(col("rep") =!= col("prev_rep")).count()
        persisted.foreach(_.unpersist())
        persisted = Some(next)
        labels = next
        converged = changed == 0
        block += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"connectedComponents did not converge within ${maxBlocks * blockSteps} propagation steps")
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", aqeWas)
      s.conf.set("spark.sql.shuffle.partitions", partsWas)
      edges.unpersist()
      if (!converged) persisted.foreach(_.unpersist())
    }
    // The final labels frame stays persisted because the returned plan
    // reads it; once the caller drops the DataFrame, Spark's
    // ContextCleaner unpersists it (cached RDDs are weakly referenced).
    labels.select(col("v").as("doc_id"), col("rep").as("cluster_rep"))
      .orderBy("doc_id")
  }
}
