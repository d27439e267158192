package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the corpus-diagnostic queries added in round 3
  * (length quartiles, bigram LM top-k, DAU split, LSH occupancy, payload
  * dedup, candidate-graph degrees). The DuckDB gate already checks exact
  * values; these pin the *semantic* invariants that would silently survive
  * a wrong-but-consistent oracle (e.g. a degree histogram that double- or
  * half-counts edges identically on both sides).
  */
class DiagnosticsSpec extends SparkSpec {

  test("text_length_quartiles: tiles partition each language in order") {
    val rows = SparkEntry.queries("text_length_quartiles")(spark, sfDir).collect()
    val perLang = rows.groupBy(_.getString(0))
    val docsPerLang = graft.sources.Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, qs) =>
      assert(qs.map(_.getLong(1)).toSeq.sorted == Seq(1L, 2L, 3L, 4L))
      // tiles cover the language exactly, sizes differ by at most 1
      assert(qs.map(_.getLong(2)).sum == docsPerLang(lang))
      val sizes = qs.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1, s"$lang tile sizes $sizes")
      // ordered by n_chars: tile i's max <= tile i+1's min
      val sorted = qs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getLong(4) <= b.getLong(3),
          s"$lang quartile ranges overlap: ${a.getLong(4)} > ${b.getLong(3)}")
      }
    }
  }

  test("text_bigram_topk: ten ranked rows per language, counts non-increasing") {
    val rows = SparkEntry.queries("text_bigram_topk")(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(1)).toSeq.sorted == (1L to 10L), s"ranks for $lang")
      val byRank = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"$lang counts not non-increasing: ${byRank.toSeq}")
      // every bigram is two space-joined words
      rs.foreach(r => assert(r.getString(2).split(" ").length == 2))
    }
  }

  test("events_daily_active: new-user column decomposes the user base") {
    val rows = SparkEntry.queries("events_daily_active")(spark, sfDir).collect()
    val totalUsers = graft.sources.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    // each user is new on exactly one day
    assert(rows.map(_.getLong(2)).sum == totalUsers)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1), s"n_new > dau on day ${r.getLong(0)}"))
    // on the first day of the log everyone is new
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(2) == first.getLong(1))
  }

  test("emb_bucket_histogram: occupancy sums back to the corpus per table") {
    val rows = SparkEntry.queries("emb_bucket_histogram")(spark, sfDir).collect()
    val nVecs = graft.sources.Tables.embeddings(spark, sfDir).count()
    val perTbl = rows.groupBy(_.getLong(0))
    assert(perTbl.keySet == Set(0L, 1L, 2L))
    perTbl.foreach { case (tbl, rs) =>
      val covered = rs.map(r => r.getLong(1) * r.getLong(2)).sum
      assert(covered == nVecs, s"table $tbl covers $covered of $nVecs vectors")
    }
  }

  test("mm_dedup_payload: savings accounting is consistent") {
    val rows = SparkEntry.queries("mm_dedup_payload")(spark, sfDir).collect()
    val nPayloads = graft.multimodal.Multimodal.mediaTable(spark, sfDir)
      .filter(col("payload").isNotNull).count()
    assert(rows.map(_.getLong(1)).sum == nPayloads)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_distinct > n_payloads")
      assert(r.getLong(3) >= 0L)
      // no duplicates <=> no saved bytes
      if (r.getLong(2) == r.getLong(1)) assert(r.getLong(3) == 0L)
    }
  }

  test("heavy_hitters_cms: contract holds for the hitters AND a broad word sample") {
    val rows = SparkEntry.queries("heavy_hitters_cms")(spark, sfDir).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getBoolean(2)), "cms contract violated for a top-10 word")
    // stronger than the declared contract: the one-sided guarantee
    // (never undercount) must hold for EVERY word, not just hitters
    val wordsAll = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.ColFns.words(col("text"))).as("word"))
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(
        wordsAll.agg(count_min_sketch(col("word"), lit(0.001d), lit(0.99d), lit(42)))
          .head().getAs[Array[Byte]](0)))
    val truth = wordsAll.groupBy("word").count().collect()
    val nTotal = truth.map(_.getLong(1)).sum
    val slack = math.ceil(nTotal * 0.001).toLong
    truth.foreach { r =>
      assert(sketch.estimateCount(r.getString(0)) >= r.getLong(1),
        s"CMS undercounts '${r.getString(0)}'")
    }
    // the eps overcount bound is a 99%-confidence guarantee, not a
    // certainty — assert it in aggregate (violating words must be rarer
    // than the sketch's 1% failure budget), not per word
    val nOver = truth.count(r =>
      sketch.estimateCount(r.getString(0)) > r.getLong(1) + slack)
    assert(nOver <= math.max(1, truth.length / 100),
      s"$nOver of ${truth.length} words exceed the eps*N overcount bound")
  }

  test("graph_degree_stats: handshake lemma against the declared pair list") {
    val hist = SparkEntry.queries("graph_degree_stats")(spark, sfDir).collect()
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
    val nEdges = pairs.count()
    val nVertices = pairs.select(col("doc_a").as("d"))
      .union(pairs.select(col("doc_b").as("d"))).distinct().count()
    assert(hist.map(r => r.getLong(0) * r.getLong(1)).sum == 2 * nEdges)
    assert(hist.map(_.getLong(1)).sum == nVertices)
    hist.foreach(r => assert(r.getLong(0) >= 1L))
  }

  test("dedup_source_overlap: matrix cells partition the candidate pairs") {
    val cells = SparkEntry.queries("dedup_source_overlap")(spark, sfDir).collect()
    val nPairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count()
    assert(cells.map(_.getLong(2)).sum == nPairs,
      "every candidate pair lands in exactly one (src_lo, src_hi) cell")
    cells.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "cells are unordered pairs")
      assert(r.getLong(2) >= 1L)
    }
  }

  test("text_scrub_terms: removed_terms matches an independent blocklist count") {
    val block = Seq("the", "a", "of", "and", "to", "table", "row")
    val rows = SparkEntry.queries("text_scrub_terms")(spark, sfDir).collect()
    // independent path: count blocklist occurrences per source directly
    val expected = graft.sources.Tables.documents(spark, sfDir)
      .select(col("source"), explode(graft.functions.ColFns.words(col("text"))).as("w"))
      .filter(col("w").isin(block.map(t => t: Any): _*))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) == expected.getOrElse(r.getString(0), 0L),
        s"removed_terms mismatch for ${r.getString(0)}")
      assert(r.getLong(3) >= 0L && r.getLong(4) >= 0L)
    }
  }

  test("dedup_incremental: admits exactly the unmatched incoming docs") {
    val kept = SparkEntry.queries("dedup_incremental")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    // independent path: replay the admission rule over the declared pairs
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val incoming = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .collect().map(_.getLong(0)).toSet
    val dropped = incoming.filter { i =>
      pairs.exists { case (a, b) =>
        (b == i && (a % 10 != 0 || a < i)) || (a == i && b % 10 != 0)
      }
    }
    assert(kept == incoming -- dropped)
    assert(kept.forall(_ % 10 == 0))
  }

  test("events_lateness_histogram: covers all but the first arrival minute, capped by the jitter bound") {
    import graft.functions.ColFns.{md5Long, nsToEpochSec}
    val rows = SparkEntry.queries("events_lateness_histogram")(spark, sfDir).collect()
    // independent arrival recomputation: events in the globally-first
    // arrival minute have no prior high-water mark and are excluded
    val arrMin = graft.sources.Tables.events(spark, sfDir)
      .select((call_function("div",
        nsToEpochSec(col("ts")) + md5Long(col("event_id").cast("string")) % 3600L,
        lit(60L))).as("m"))
    val firstMin = arrMin.agg(min(col("m"))).collect().head.getLong(0)
    val nExcluded = arrMin.filter(col("m") === firstMin).count()
    val nEvents = arrMin.count()
    assert(rows.map(_.getLong(1)).sum == nEvents - nExcluded)
    // jitter ≤ 3600 s bounds lateness below 3600 s → bucket ≤ 11 (see
    // the query's scaladoc: a simulation artifact, asserted closed-form)
    assert(rows.forall(r => r.getLong(0) >= 0L && r.getLong(0) <= 11L))
    assert(rows.map(_.getLong(1)).forall(_ >= 1L))
  }

  test("mix_sources_budget: greedy fill is within budget and maximal") {
    val rows = SparkEntry.queries("mix_sources_budget")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (weight, alloc, kept) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(weight >= 1L && weight <= 3L)
      assert(kept <= alloc, s"${r.getString(0)} kept $kept > alloc $alloc")
    }
    // the budget is half the corpus: total allocation can't exceed it
    val totalTokens = graft.sources.Tables.documents(spark, sfDir)
      .select(size(graft.functions.ColFns.words(col("text"))).cast("long").as("nt"))
      .agg(sum(col("nt"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum <= totalTokens / 2 + rows.length,
      "per-source floor-divided allocations exceed the global budget")
    assert(rows.exists(_.getLong(4) > 0L), "no source kept any document")
  }
}
