package graft

/** Smoke + golden checks for the declared query inventory on sf0.001.
  * The authoritative differential check is the DuckDB oracle
  * (tools/check_oracle.py, driver t2); these specs pin schema/shape and a
  * few closed-form values so regressions fail fast in `sbt test`.
  */
class QueriesSpec extends SparkSpec {

  test("every declared query has an oracle and runs with rows > 0") {
    val qs = SparkEntry.queries
    // every oracle refers to a declared query, and every declared query
    // has an oracle (approx_stats gained one in round 2: exact columns
    // plus the sketch-error contract boolean)
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    assert((qs.keySet -- SparkEntry.oracleSql.keySet) == Set.empty[String])
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"query $name returned no rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("text_dedup_spans is consistent with text_dup_span_ratio") {
    // Removal and profiling share the span-digest construction, so their
    // per-doc verdicts must agree: a doc with NO duplicated span keeps
    // every token, and kept counts never exceed totals. (Keep-one
    // semantics means a doc whose spans are ALL duplicated may still keep
    // everything — it can be the canonical occurrence of every span — so
    // the dup==1 direction is pinned on a planted two-copy fixture in
    // EquivalenceSpec, not on whatever shapes this SF's corpus happens to
    // contain.) This pins the two queries to one tokenization/digesting —
    // a drift in either breaks the join.
    def check(dir: String): Int = {
      val ratio = SparkEntry.queries("text_dup_span_ratio")(spark, dir)
        .select("doc_id", "dup_ratio")
      val removal = SparkEntry.queries("text_dedup_spans")(spark, dir)
      val joined = removal.join(ratio, Seq("doc_id"), "left").collect()
      joined.foreach { r =>
        val (nTok, nKept) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"))
        assert(nKept <= nTok, s"doc ${r.get(0)}: kept $nKept > total $nTok")
        val dup = if (r.isNullAt(r.fieldIndex("dup_ratio"))) 0.0
                  else r.getAs[Double]("dup_ratio")
        if (dup == 0.0) assert(nKept == nTok,
          s"doc ${r.get(0)}: no dup spans but ${nTok - nKept} tokens removed")
      }
      joined.length
    }
    // Property sweep over the fixture: holds vacuously on an empty or
    // reshaped corpus — no assert encodes what shapes the fixture contains.
    check(sfDir)
    // Branch coverage on a planted corpus (round-6 advice): a two-copy doc
    // (canonical keeps all / copy loses all) and a no-dup doc, so both
    // directions of the agreement are exercised regardless of fixture
    // regeneration. EquivalenceSpec pins the removal-side values; this
    // pins the cross-query join on the same shapes.
    val dir = java.nio.file.Files.createTempDirectory("graft-span-agree").toString
    import spark.implicits._
    val boiler = (1 to 12).map(i => s"tok$i").mkString(" ")
    val unique = "unique words only here nothing repeats at all ever"
    Seq((1L, boiler, "en", "src_a", boiler.length),
        (2L, boiler, "en", "src_b", boiler.length),
        (3L, unique, "en", "src_c", unique.length))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(check(dir) == 3, "planted corpus did not produce all three docs")
  }

  test("events_anomaly_mad: the 3-MAD rule is self-consistent and both flag arms fire on a planted spike") {
    import spark.implicits._
    // Planted series: type "a" has 9 quiet days (counts 10±1) and one
    // 50-count spike — median 10, MAD 1, spike adev 40 > 3 → exactly one
    // anomaly. Type "b" is constant — MAD 0, no deviation, no flags.
    val dir = java.nio.file.Files.createTempDirectory("graft-mad").toString
    val counts = Map(0 -> 10, 1 -> 9, 2 -> 11, 3 -> 10, 4 -> 10,
                     5 -> 9, 6 -> 11, 7 -> 10, 8 -> 10, 9 -> 50)
    val rows =
      (for ((day, n) <- counts.toSeq; i <- 0 until n)
        yield (day.toLong * 1000 + i, day, "a")) ++
      (for (day <- 0 until 10; i <- 0 until 5)
        yield (100000L + day * 1000 + i, day, "b"))
    rows.map { case (id, day, t) =>
        (id, java.time.LocalDateTime.of(2021, 1, 1, 0, 0).plusDays(day)
          .plusSeconds(id % 1000), id % 7, t, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("events_anomaly_mad")(spark, dir).collect()
    assert(got.length == 20)
    val flagged = got.filter(_.getAs[Long]("is_anomaly") == 1L)
      .map(r => (r.getString(0), r.getAs[Long]("day")))
    assert(flagged.length == 1 && flagged.head._1 == "a", flagged.mkString(","))
    // self-consistency: every emitted flag equals the rule recomputed
    // from the emitted median/MAD columns
    got.foreach { r =>
      val adev = math.abs(r.getAs[Long]("n").toDouble - r.getAs[Double]("day_median"))
      val expect = if (adev > 3.0 * r.getAs[Double]("day_mad")) 1L else 0L
      assert(r.getAs[Long]("is_anomaly") == expect, r.toString)
    }
    // the constant series has MAD 0 and no flags
    assert(got.filter(_.getString(0) == "b")
      .forall(r => r.getAs[Double]("day_mad") == 0.0 && r.getAs[Long]("is_anomaly") == 0L))
  }

  test("mr_sum_by_key groups to the 3 returnflags") {
    val rows = SparkEntry.queries("mr_sum_by_key")(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "N", "R"))
  }

  test("point_get returns defaults for absent keys") {
    val rows = SparkEntry.queries("point_get")(spark, sfDir).collect()
    assert(rows.length == 3)
    assert(rows.last.getDouble(1) == -1.0) // key 99999999 absent
  }

  test("sim_cosine_topk: 5 probes x top-5, scores in [-1, 1]") {
    val rows = SparkEntry.queries("sim_cosine_topk")(spark, sfDir).collect()
    assert(rows.length == 25)
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("unset_anti removed every 10th order key") {
    val rows = SparkEntry.queries("unset_anti")(spark, sfDir).collect()
    assert(rows.forall(_.getLong(0) % 10 != 0))
  }

  test("join_star_rollup has grand-total row matching lineitem join count") {
    val rows = SparkEntry.queries("join_star_rollup")(spark, sfDir).collect()
    val grand = rows.head // nulls sort first
    assert(grand.isNullAt(0) && grand.isNullAt(1))
    val detail = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(detail.map(_.getLong(3)).sum == grand.getLong(3))
  }

  test("approx_stats errors are bounded vs exact") {
    val rows = SparkEntry.queries("approx_stats")(spark, sfDir).collect()
    val exact = SparkEntry.queries("distinct_keys")(spark, sfDir) // sanity anchor
    assert(exact.count() == 1)
    rows.foreach { r =>
      val approx = r.getLong(1)
      assert(approx > 0 && approx < 10000, s"implausible HLL estimate $approx")
    }
  }

  test("partitioned parquet sink prunes partitions on read") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events_by_type"
    graft.sources.Tables.events(spark, sfDir)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_type#") && scan.contains("click"),
      s"expected partition pruning in plan:\n$scan")
    assert(pruned.count() > 0)
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    import org.apache.spark.sql.functions.col
    // warehouse dir is a static conf, set in TestSpark's builder
    graft.sources.Tables.orders(spark, sfDir)
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    graft.sources.Tables.lineitem(spark, sfDir)
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("queries are deterministic across repeated runs") {
    for (name <- Seq("text_wordcount_topk", "events_tumbling_agg", "reduce_first_last")) {
      val a = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
      val b = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
      assert(a == b, s"$name not deterministic")
    }
  }
}
