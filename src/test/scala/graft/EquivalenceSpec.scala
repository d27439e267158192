package graft

import graft.queries.DedupQueries

/** Cross-query identities the design claims, asserted on real data:
  *
  *  - dedup_simhash_banded is EXACTLY dedup_simhash (pigeonhole: a pair at
  *    Hamming ≤ 4 over 60 bits has differing bits in at most 4 of 6
  *    disjoint 10-bit blocks, so at least 2 blocks — hence at least one of
  *    the C(6,2) block-pair join keys — match exactly → the banded
  *    equi-join generates a candidate superset, and the final Hamming
  *    filter makes the sets equal);
  *  - dedup_jaccard_on_lsh is a SUBSET of dedup_ngram_jaccard (same exact
  *    scoring, candidates restricted to LSH pairs) — and on this corpus,
  *    where RecallSpec measures MinHash candidate recall 1.0, the two are
  *    equal.
  */
class EquivalenceSpec extends SparkSpec {

  test("banded simhash equals the all-pairs simhash result exactly") {
    val banded = DedupQueries.dedupSimhashBanded(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val brute = DedupQueries.dedupSimhash(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(banded == brute, s"banded ${banded.size} vs brute ${brute.size}")
    assert(brute.nonEmpty)
    // The saturation ladder's grown form — (7,3), C(7,3)=35 triples of
    // 24–27-bit keys, VolumeProbe's 100× parameterization — is the SAME
    // result set by the same pigeonhole (≥ 3 of 7 blocks identical at
    // Hamming ≤ 4 ⊇ one full triple).
    val grown = DedupQueries.dedupSimhashBandedBlocks(7, 3)(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(grown == brute, s"(7,3) ${grown.size} vs brute ${brute.size}")
    // (8,4) — the ladder's 5M-doc step (the 1000× decade parameterization;
    // C(8,4)=70 quadruples of 28–30-bit keys). The pigeonhole is TIGHT
    // here: Hamming ≤ 4 guarantees exactly ≥ 4 identical blocks, one full
    // quadruple — the last rung before the 60-bit signature is out of
    // key material.
    val grown84 = DedupQueries.dedupSimhashBandedBlocks(8, 4)(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(grown84 == brute, s"(8,4) ${grown84.size} vs brute ${brute.size}")
  }

  test("simhash banding ladder: rule picks by corpus size, rejects sub-pigeonhole forms") {
    import DedupQueries.simhashBandedParamsFor
    assert(simhashBandedParamsFor(5000L) == ((6, 2)))     // sf0.1
    assert(simhashBandedParamsFor(139000L) == ((6, 2)))   // just under 2^21/15
    assert(simhashBandedParamsFor(500000L) == ((7, 3)))   // VolumeProbe's 100×
    assert(simhashBandedParamsFor(5000000L) == ((8, 4)))
    intercept[IllegalArgumentException](simhashBandedParamsFor(100000000L))
    // m − 4 < r loses pairs silently — constructing it must throw.
    intercept[IllegalArgumentException](
      DedupQueries.dedupSimhashBandedBlocks(6, 3)(spark, sfDir))
  }

  test("capped minhash equals uncapped on the fixture (max bucket under the cap)") {
    val capped = SparkEntry.queries("dedup_minhash_capped")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val plain = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(capped == plain)
    assert(plain.nonEmpty)
  }

  test("bucket cap drops boilerplate black holes, keeps normal near-dups") {
    import spark.implicits._
    // 40 docs with the IDENTICAL shingle set — one 40-doc bucket in every
    // band (a licence-header black hole: 780 candidate pairs uncapped) —
    // plus one normal near-dup pair with its own shingles.
    val boiler = for (doc <- 1L to 40L; i <- 1 to 10)
      yield (doc, s"boiler shingle $i")
    val pair = for (doc <- Seq(100L, 101L); i <- 1 to 10)
      yield (doc, s"real content $i")
    val sh = (boiler ++ pair).toDF("doc_id", "s")
    val capped = DedupQueries.minhashCandidatesCapped(sh, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)), s"got $capped")
    val uncapped = DedupQueries.minhashCandidatesCapped(sh, 1000)
      .collect().length
    assert(uncapped == 40 * 39 / 2 + 1) // the black hole enumerated
  }

  test("jaccard-on-LSH is a subset of exact jaccard, equal at full recall") {
    val onLsh = DedupQueries.dedupJaccardOnLsh(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val exact = DedupQueries.dedupNgramJaccard(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(onLsh.subsetOf(exact), "candidate-restricted result must be a subset")
    assert(onLsh == exact, s"recall on this corpus is 1.0, sets should match " +
      s"(onLsh=${onLsh.size} exact=${exact.size})")
  }

  test("df-capped ngram jaccard equals the uncapped truth on the fixture (max df under the cap)") {
    val capped = SparkEntry.queries("dedup_ngram_jaccard_capped")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val exact = DedupQueries.dedupNgramJaccard(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(capped == exact, s"capped=${capped.size} exact=${exact.size}")
    assert(exact.nonEmpty)
  }

  test("shingle df cap drops boilerplate hot shingles from the whole universe") {
    import spark.implicits._
    // One shingle shared by 50 docs (licence boilerplate — O(df²) = 1225
    // join rows for zero discrimination) plus a genuine near-dup pair
    // sharing 9 of 10 shingles, one of which is the hot one.
    val boiler = (1L to 50L).map(doc => (doc, "hot boilerplate shingle"))
    val pair = for (doc <- Seq(100L, 101L); i <- 1 to 9)
      yield (doc, s"real content $i")
    val sh = (boiler ++ pair
      ++ Seq((100L, "hot boilerplate shingle"), (101L, "hot boilerplate shingle")))
      .toDF("doc_id", "s")
    val capped = DedupQueries.ngramJaccardCapped(sh, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // The hot shingle is dropped from intersection AND sizes: the pair
    // scores 9/9 = 1.0 over the reduced universe, and the 50 boiler-only
    // docs (empty capped shingle sets) produce no pairs at all.
    assert(capped.toSeq == Seq((100L, 101L, 1.0)), s"got ${capped.mkString(",")}")
    // Uncapped twin on the same frame: the black hole is enumerated.
    val uncapped = DedupQueries.ngramJaccardCapped(sh, 1000).collect()
    // 1225 boiler-boiler pairs (jaccard 1.0) + the real pair; boiler-real
    // pairs score 1/10 < 0.5 and fall to the threshold.
    assert(uncapped.length == 50 * 49 / 2 + 1)
  }

  test("text_dedup_spans keeps exactly one occurrence of a duplicated span (Lee et al. keep-one)") {
    import spark.implicits._
    // Two byte-identical 12-token docs plus one unique doc: under the
    // round-6 remove-all semantics BOTH copies lost every token; Lee et
    // al.'s ExactSubstr (arXiv:2107.06499) keeps one occurrence. The
    // canonical copy is the (min doc_id, min position) occurrence of every
    // one of its spans, so it survives intact; the second copy is
    // non-canonical everywhere and is fully cut; the unique doc (all spans
    // df=1) is untouched. This is the round-6 verdict's "what's wrong #1"
    // pinned as behavior, not scaladoc.
    val dir = java.nio.file.Files.createTempDirectory("graft-keepone").toString
    val boiler = (1 to 12).map(i => s"tok$i").mkString(" ")
    val unique = "unique words only here nothing repeats at all ever"
    Seq((1L, boiler, "en", "src_a", boiler.length),
        (2L, boiler, "en", "src_b", boiler.length),
        (3L, unique, "en", "src_c", unique.length))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.TextQueries.textDedupSpans(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"), r.getAs[String]("kept_md5"))))
      .toMap
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    val boilerMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(boiler.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows(1L) == ((12L, 12L, boilerMd5)), s"canonical copy mangled: ${rows(1L)}")
    assert(rows(2L) == ((12L, 0L, emptyMd5)), s"second copy not removed: ${rows(2L)}")
    assert(rows(3L)._1 == rows(3L)._2, s"unique doc lost tokens: ${rows(3L)}")
  }

  test("containment flags a doc-in-doc pair that Jaccard misses, oriented small-into-big") {
    import spark.implicits._
    // A 60-token article, a 12-token quote lifted verbatim from its
    // middle, and an unrelated doc. Every 3-shingle of the quote appears
    // in the article → containment = 1.0, while Jaccard = 10/58 ≈ 0.17
    // sits far below the near-dup threshold — the asymmetric case the
    // operator exists for. The pair must orient (contained=quote,
    // container=article) regardless of id order, so ids are chosen with
    // the CONTAINER first (a (na<=nb ⇒ doc_a) tie-break bug would flip
    // it). The unrelated doc shares no shingle and must not pair.
    val dir = java.nio.file.Files.createTempDirectory("graft-contain").toString
    val article = (1 to 60).map(i => s"w$i").mkString(" ")
    val quote = (25 to 36).map(i => s"w$i").mkString(" ")
    val other = (1 to 20).map(i => s"z$i").mkString(" ")
    Seq((1L, article, "en", "src_a", article.length),
        (2L, quote, "en", "src_b", quote.length),
        (3L, other, "en", "src_c", other.length))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.DedupQueries.dedupContainment(spark, dir).collect()
    assert(rows.length == 1, rows.mkString("; "))
    val r = rows.head
    assert(r.getAs[Long]("doc_contained") == 2L && r.getAs[Long]("doc_container") == 1L)
    assert(r.getAs[Long]("n_contained") == 10L && r.getAs[Long]("n_container") == 58L)
    assert(r.getAs[Double]("containment") == 1.0)
    assert(r.getAs[Double]("jaccard") < 0.5, s"jaccard ${r.getAs[Double]("jaccard")}")
  }

  test("textTokenRarity: closed-form scores on a planted Zipf head + rare tail") {
    import spark.implicits._
    // 20-word vocab: c1..c16 at cf=10 (the broadcast head — exactly the
    // head-16 cut, so the tail branch carries the r-words and is
    // non-vacuous), r1..r4 at cf=1. toks=164, vocab=20; the relative
    // rarity rule (cf·8·20 < 164) admits exactly the cf=1 words
    // (1·160 < 164) and rejects cf=10 (800 > 164).
    val dir = java.nio.file.Files.createTempDirectory("graft-rarity").toString
    val cs = (1 to 16).map(i => s"c$i")
    val doc1 = (cs :+ "r1").mkString(" ")                     // each c ×1, r1
    val doc2 = (cs.flatMap(w => Seq.fill(9)(w)) ++ Seq("r2", "r3", "r4")).mkString(" ")
    Seq((1L, doc1, "en", "s1", doc1.length),
        (2L, doc2, "en", "s1", doc2.length))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.TextQueries.textTokenRarity(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 2)
    assert(rows(1L).getAs[Long]("n_tokens") == 17L)
    assert(math.abs(rows(1L).getAs[Double]("mean_token_cf") - 161.0 / 17) < 1e-6)
    assert(math.abs(rows(1L).getAs[Double]("rare_frac") - 1.0 / 17) < 1e-6)
    assert(rows(2L).getAs[Long]("n_tokens") == 147L)
    assert(math.abs(rows(2L).getAs[Double]("mean_token_cf") - 1443.0 / 147) < 1e-6)
    assert(math.abs(rows(2L).getAs[Double]("rare_frac") - 3.0 / 147) < 1e-6)
  }

  test("textTokenRarity: empty docs drop out; a sub-head vocab leaves the tail branch empty") {
    import spark.implicits._
    // Vocab of 3 (< the head-16 cut): every word is head, the tail
    // union branch carries zero rows — the degenerate split must not
    // error or duplicate. Docs 2 (empty text) and 3 (whitespace only)
    // tokenize to nothing and must be ABSENT from the output, matching
    // the oracle's GROUP BY over the token stream.
    val dir = java.nio.file.Files.createTempDirectory("graft-rarity2").toString
    Seq((1L, "a b b", "en", "s1", 5), (2L, "", "en", "s1", 0),
        (3L, "   ", "en", "s1", 3))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.TextQueries.textTokenRarity(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    val r = rows.head
    // cf(a)=1, cf(b)=2, toks=3, vocab=2: rare rule 1·8·2=16 < 3 is
    // false — nothing rare; mean = (1 + 2 + 2) / 3.
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(math.abs(r.getAs[Double]("mean_token_cf") - 5.0 / 3) < 1e-6)
    assert(r.getAs[Double]("rare_frac") == 0.0)
  }
}
