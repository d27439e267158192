package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Sessions

import graft.queries.TextQueries

/** Run-to-target BPE merge training (round-15 verdict #7) — the N-round
  * form behind the declared fixed-[[TextQueries.BpeMerges]]-round
  * `text_bpe_train` oracle instance, completing the driver-loop family
  * (lloyd / PageRank.iterate / Lpa.iterate / this): the declared query
  * pins the pair-count → arg-max → merge semantics on unrolled rounds;
  * this facade trains to a TARGET merge-table size with the real
  * tokenizer-training stop rule — stop early when the best remaining
  * pair's count falls below `minCount` (Sennrich et al. 2016 §3.2 stop
  * merging at frequency 1: a merge seen once generalizes to nothing) or
  * when no adjacent pair remains at all.
  *
  * One deliberate divergence from the declared query's plan: each
  * round's ≤ 1-row arg-max winner is COLLECTED to the driver (the
  * round's one action — the lloyd count() precedent) and the merge is
  * applied as string LITERALS, so the per-round plan is a pure
  * projection over the ≤ [[TextQueries.BpeVocabCap]]-row vocabulary —
  * no per-round cross join at all (the declared query keeps the
  * broadcast-cross form because its oracle must express the winner as
  * a CTE). The merge table is the driver-resident artifact a tokenizer
  * ships — ≤ targetMerges rows by definition — so driver residency is
  * the deployment shape, not a scale leak; the corpus is still touched
  * exactly once (the word-count aggregate behind the capped
  * vocabulary).
  *
  * Loop discipline (the [[KMeans]]/[[PageRank]]/[[Lpa]] contract):
  * conf-isolated `newSession()` clone, AQE off, shuffle width
  * `loopParts`; the capped vocabulary snapshots once and each round
  * re-snapshots the ≤ cap-row merged vocabulary (localCheckpoint per
  * round — real vocab targets run thousands of rounds, the dependency-
  * graph depth the PageRank lesson is about); hitting `targetMerges`
  * is SUCCESS (the budget is the contract), stopping early on
  * exhaustion is recorded in [[lastConverged]].
  */
object Bpe {

  /** Merge rounds the most recent [[train]] completed (= rows in the
    * returned table). Probe introspection, the [[KMeans.lastRounds]]
    * contract; reset at entry. */
  @volatile var lastRounds: Int = -1

  /** True iff the most recent [[train]] stopped EARLY — no adjacent
    * pair left, or the best pair's count fell below `minCount` —
    * rather than by reaching `targetMerges`. */
  @volatile var lastConverged: Boolean = false

  /** @param docWords     (doc_id, word) occurrence stream — the
    *                     [[TextQueries.bpeDocWords]] contract (empty
    *                     and marker-bearing words already excluded)
    * @param targetMerges merge-table size to train toward
    * @param minCount     stop once the best pair's weighted count
    *                     drops below this (2 = Sennrich's "frequency
    *                     1 is noise" rule; 1 disables the early stop)
    * @param loopParts    shuffle width for the iterative stage
    * @return the trained merge table (round, lhs, rhs, pair_count),
    *         ≤ targetMerges rows, under the caller's session */
  def train(docWords: DataFrame, targetMerges: Int, minCount: Long = 2L,
            loopParts: Int = 8): DataFrame = {
    require(targetMerges >= 1, s"targetMerges must be positive: $targetMerges")
    require(minCount >= 1L, s"minCount must be positive: $minCount")
    lastRounds = -1
    lastConverged = false
    val parent = docWords.sparkSession
    val s = parent.newSession()
    Sessions.copyRuntimeConf(parent, s)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    val MM = TextQueries.BpeMark + TextQueries.BpeMark
    // The one corpus pass: word counts → top-cap vocabulary, wrapped.
    val (v0Rdd, v0) = Sessions.snapshot(Sessions.rebind(
      docWords.groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("word"))
        .limit(TextQueries.BpeVocabCap)
        .select(TextQueries.bpeWrap(col("word")).as("w"), col("cnt")), s))
    var vocab = v0
    var vocabRdd: org.apache.spark.rdd.RDD[_] = v0Rdd
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var round = 0
    var exhausted = false
    var inFlight: org.apache.spark.rdd.RDD[_] = null
    try {
      while (round < targetMerges && !exhausted) {
        val syms = split(col("w").substr(lit(2), length(col("w")) - 2), MM)
        // The round's ONE action: the ≤ 1-row arg-max winner, collected.
        val winner: Array[Row] = vocab
          .select(col("cnt"), syms.as("syms"))
          .filter(size(col("syms")) > 1)
          .select(col("cnt"), explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("pr"))
          .groupBy(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
          .agg(sum(col("cnt")).as("pair_count"))
          .orderBy(desc("pair_count"), asc("lhs"), asc("rhs"))
          .limit(1)
          .collect()
        if (winner.isEmpty || winner.head.getAs[Long]("pair_count") < minCount) {
          exhausted = true
        } else {
          val (lhs, rhs, cnt) = (winner.head.getAs[String]("lhs"),
            winner.head.getAs[String]("rhs"),
            winner.head.getAs[Long]("pair_count"))
          round += 1
          merges += ((round.toLong, lhs, rhs, cnt))
          if (round < targetMerges) {
            val (nextRdd, next) = Sessions.snapshot(
              vocab.select(
                TextQueries.bpeApply(col("w"), lit(lhs), lit(rhs)).as("w"),
                col("cnt")))
            nextRdd.localCheckpoint()
            inFlight = nextRdd
            next.count() // materialize before releasing the previous round
            vocabRdd.unpersist(blocking = false)
            vocab = next
            vocabRdd = nextRdd
            inFlight = null
          }
        }
      }
      lastRounds = round
      lastConverged = exhausted
    } finally {
      if ((inFlight != null) && (inFlight ne vocabRdd))
        inFlight.unpersist(blocking = false)
      vocabRdd.unpersist(blocking = false)
    }
    import parent.implicits._
    merges.result().toDF("round", "lhs", "rhs", "pair_count")
      .orderBy("round")
  }
}
