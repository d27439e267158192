package graft

import graft.queries.{ExtensionQueries, SimilarityQueries}

/** Semantics of the round-15 stretch pair: [[SimilarityQueries
  * .simRangeSearch]] (radius retrieval is CONSISTENT with the exact
  * top-k baseline — same scoring, threshold honored both directions)
  * and [[ExtensionQueries.olapGroupingSets]] (the grouping_id algebra
  * and subtotal arithmetic of the asymmetric set list). */
class RangeGroupingSpec extends SparkSpec {

  test("range search: every hit clears tau, and every top-k hit above tau is found") {
    val tau = math.sqrt(SimilarityQueries.RangeTau2Num.toDouble /
                        SimilarityQueries.RangeTau2Den)
    val range = SparkEntry.queries("sim_range_search")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id")) ->
        r.getAs[Double]("score")).toMap
    assert(range.nonEmpty)
    // Threshold honored (score is the rounded cosine; allow the round-6
    // wobble at the boundary).
    range.values.foreach(s => assert(s >= tau - 1e-6, s"score $s under tau $tau"))
    // Containment against the independent exact top-k baseline: any
    // top-k result at or above tau must be in the tau-ball. (Strictly
    // above the boundary: a rounded score EQUAL to tau can sit either
    // side of the exact integer cross-multiply.)
    val topk = SparkEntry.queries("sim_cosine_topk")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id")) ->
        r.getAs[Double]("score"))
    topk.filter(_._2 > tau + 1e-6).foreach { case (k, s) =>
      assert(range.contains(k), s"top-k hit $k (score $s) missing from range result")
    }
  }

  test("grouping sets: gid algebra and subtotal arithmetic") {
    val rows = SparkEntry.queries("olap_grouping_sets")(spark, sfDir).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    // Exactly the three declared sets: detail (0), source subtotal
    // (lang aggregated = low bit, gid 1), grand total (3) — the
    // lang-only set (gid 2) a CUBE would add must NOT appear.
    assert(byGid.keySet == Set(0L, 1L, 3L), byGid.keySet.toString)
    val grand = byGid(3L).head
    assert(byGid(3L).length == 1)
    // Subtotals are exact partitions at every level.
    def sums(gid: Long) = (
      byGid(gid).map(_.getAs[Long]("n_docs")).sum,
      byGid(gid).map(_.getAs[Long]("sum_chars")).sum)
    assert(sums(0L) == sums(1L))
    assert(sums(1L) ==
      ((grand.getAs[Long]("n_docs"), grand.getAs[Long]("sum_chars"))))
    // gid encodes NULL provenance: detail rows carry both keys, subtotal
    // rows a source but no lang, the grand total neither.
    byGid(0L).foreach(r => assert(!r.isNullAt(0) && !r.isNullAt(1)))
    byGid(1L).foreach(r => assert(!r.isNullAt(0) && r.isNullAt(1)))
    assert(grand.isNullAt(0) && grand.isNullAt(1))
  }
}
