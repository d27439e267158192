package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Sessions

/** Distributed connected components — the operator behind `dedup_clusters`
  * (each near-dup pair component collapses to its min doc_id, the
  * canonical representative), factored out so specs can drive it on
  * arbitrary graphs.
  *
  * Algorithm: per round, (1) PROPAGATE rep'(v) = min rep over N(v) ∪ {v},
  * then (2) SHORTCUT rep''(v) = rep'(rep'(v)) (pointer jumping). Labels
  * are monotone non-increasing and always ids of same-component vertices,
  * and the reach of the min label roughly doubles per round, so the
  * fixpoint (= the component-min labeling) lands in O(log diameter)
  * rounds — propagation alone is O(diameter), which a 100 TB near-dup
  * chain can push past any fixed cap (round-2 verdict). A 300-vertex path
  * converges in ≤ 12 rounds here vs 300 steps for pure propagation
  * (ComponentsSpec).
  *
  * Execution notes earned the hard way (see DedupQueries history):
  *  - the whole loop runs on a `newSession()` CLONE of the caller's
  *    session via [[Sessions.rebind]]: AQE off (it materializes every
  *    Exchange as its own scheduled query stage — ~0.5 s pure scheduling
  *    per shuffle with nothing to adapt on a tiny graph) and
  *    shuffle.partitions = loopParts, with the caller's conf untouched
  *    and cached data shared (the cache lives on shared RDD handles);
  *  - every iterated frame is a [[Sessions.snapshot]] (flat LogicalRDD,
  *    caller-owned persist handle): plain persist() keeps full lineage
  *    and the shortcut self-reference DOUBLES the logical plan per round
  *    — measured planning overhead grew 0.2 s → 1.2 s/round by round 4
  *    and would dwarf execution by round 10;
  *  - ONE action per round: the changed-count materializes `prop` and
  *    `next` into their snapshots and reads `prev` from the previous
  *    round's — nothing re-executes a prior round's lineage (the round-2
  *    convergence check re-ran (blockSteps−1) propagation steps);
  *  - candidate-pair input is snapshotted FIRST, so an expensive upstream
  *    lineage (the MinHash-LSH join for `dedup_clusters`) executes once,
  *    not once per frame that mentions the edges (round 2 paid it ~3×);
  *  - the propagate step is a SINGLE join+groupBy over self-looped edges
  *    so the label frame appears exactly once; the shortcut self-join
  *    aliases ONE frame twice (the supported pattern) — never a frame
  *    against its own derivative, whose column resolution is ambiguous
  *    and once silently broke;
  *  - non-convergence within the cap THROWS — wrong labels must never
  *    ship silently. With doubling reach, maxRounds = 50 covers any
  *    diameter below ~2^49; hitting the cap means a bug, not a big graph.
  */
object Components {

  /** Rounds the most recent [[connectedComponents]] call took to reach
    * its fixpoint — probe introspection only. VolumeProbe normalizes the
    * clusters entry's per-round linearity gate by this: every round
    * re-joins the full edge set, so total join-output rows are
    * rounds × O(edges), and rounds track the MAX component diameter in
    * the corpus (O(log d) by the doubling argument above) — a property
    * of the data's cluster structure, not of data volume. Not
    * thread-safe across concurrent component runs. */
  @volatile var lastRounds: Int = -1

  /** @param pairs     (doc_a, doc_b) undirected candidate pairs
    * @param loopParts shuffle width for the iterative stage (size to the
    *                  edge volume; a handful for small graphs)
    * @param maxRounds cap on propagate+shortcut rounds (each ~doubles the
    *                  propagation reach; 50 ≈ diameter 2^49)
    * @return (doc_id, cluster_rep) for every vertex of the pair graph */
  def connectedComponents(pairs: DataFrame, loopParts: Int,
                          maxRounds: Int = 50): DataFrame = {
    val parent = pairs.sparkSession
    val s = parent.newSession()
    // The clone inherits builder-time options only; carry over the
    // parent's runtime-set SQL confs (a lineage reading the events table
    // needs its nanosAsLong flag, etc.) BEFORE narrowing the loop conf.
    Sessions.copyRuntimeConf(parent, s)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    val debug = sys.props.get("graft.cc.debug").contains("true")
    // The candidate-pair lineage can be the heaviest stage of the whole
    // query (for dedup_clusters it is the corpus-wide MinHash-LSH join),
    // so it is snapshotted under the PARENT session — full shuffle width,
    // AQE skew handling intact; loopParts sizes the tiny label loop, not
    // the corpus scan. Only the flat LogicalRDD result is rebound into
    // the narrow clone.
    val (pRdd, p0) = Sessions.snapshot(pairs)
    val p = Sessions.rebind(p0, s)
    val undirected = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // Snapshot the vertex set once: it feeds BOTH the self-looped edges
    // and the initial labels, and as a plain subtree the union+distinct
    // shuffle over the full vertex set would execute twice at startup
    // (round-9 review).
    val (vRdd, verts) = Sessions.snapshot(
      undirected.select(col("src").as("v")).distinct())
    val (edgesRdd, edges) = Sessions.snapshot(
      undirected
        .union(verts.select(col("v").as("src"), col("v").as("dst")))
        .repartition(loopParts, col("dst")))
    var (prevRdd, prev) = Sessions.snapshot(
      verts.select(col("v"), col("v").as("rep"))
        .repartition(loopParts, col("v")))
    var round = 0
    var converged = false
    // Track the round's in-flight snapshots so a mid-round failure (task
    // error, cancellation) releases them in the finally block — they are
    // vertex-set-sized and a catch-and-retry caller would otherwise leak
    // two cached RDDs per failed attempt (round-9 review).
    var inFlightProp: org.apache.spark.rdd.RDD[_] = null
    var inFlightNext: org.apache.spark.rdd.RDD[_] = null
    try {
      while (round < maxRounds && !converged) {
        val t0 = System.nanoTime()
        val (propRdd, prop) = Sessions.snapshot(
          edges.join(prev, col("dst") === col("v"))
            .groupBy(col("src")).agg(min(col("rep")).as("rep"))
            .select(col("src").as("v"), col("rep")))
        inFlightProp = propRdd
        val (nextRdd, next) = Sessions.snapshot(
          prop.as("a").join(prop.as("b"), col("a.rep") === col("b.v"))
            .select(col("a.v").as("v"), col("b.rep").as("rep")))
        inFlightNext = nextRdd
        // The ONE action of the round: materializes prop + next snapshots
        // and compares against the cached prev in the same job.
        val changed = next.join(
            prev.select(col("v").as("pv"), col("rep").as("prev_rep")),
            col("v") === col("pv"))
          .filter(col("rep") =!= col("prev_rep")).count()
        if (debug)
          println(f"[cc] round $round changed=$changed ${(System.nanoTime() - t0) / 1e9}%.2f s")
        propRdd.unpersist(blocking = false)
        inFlightProp = null
        prevRdd.unpersist(blocking = false)
        if (round == 0) { // edges + labels are materialized now
          pRdd.unpersist(blocking = false)
          vRdd.unpersist(blocking = false)
        }
        prev = next
        prevRdd = nextRdd
        inFlightNext = null
        converged = changed == 0
        round += 1
      }
      lastRounds = round
      if (!converged)
        throw new IllegalStateException(
          s"connectedComponents did not converge within $maxRounds rounds")
    } finally {
      if (inFlightProp != null) inFlightProp.unpersist(blocking = false)
      if ((inFlightNext != null) && (inFlightNext ne prevRdd))
        inFlightNext.unpersist(blocking = false)
      edgesRdd.unpersist(blocking = false)
      pRdd.unpersist(blocking = false)
      vRdd.unpersist(blocking = false)
      if (!converged) prevRdd.unpersist(blocking = false)
    }
    // The final labels stay persisted because the returned plan reads that
    // RDD directly; once the caller drops the DataFrame, Spark's
    // ContextCleaner unpersists (cached RDDs are weakly referenced).
    // Rebind onto the caller's session so downstream runs under ITS conf.
    Sessions.rebind(
      prev.select(col("v").as("doc_id"), col("rep").as("cluster_rep")),
      parent).orderBy("doc_id")
  }
}
