package graft

import org.apache.spark.sql.functions._

import graft.queries.LinkageQueries

/** Label propagation ([[LinkageQueries.graphLabelPropagation]]) against a
  * sequential reference of the same mode/min-tiebreak update on a planted
  * two-community graph — the PageRankSpec doctrine: the DuckDB oracle
  * pins the unrolled rounds cross-engine on the fixture; this pins the
  * update SEMANTICS (mode vote, min-label tie, round count) on a graph
  * whose community structure the test derives by hand-executable rules.
  */
class LpaSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: LpaIters synchronous rounds of
    * label := mode over neighbor labels, ties to the smallest label. */
  private def refLpa(adj: Map[Long, Seq[Long]], iters: Int): Map[Long, Long] = {
    var lbl = adj.keysIterator.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      lbl = adj.map { case (v, ns) =>
        val votes = ns.groupBy(lbl).view.mapValues(_.size.toLong).toMap
        val best = votes.toSeq.map { case (l, c) => (-c, l) }.min._2
        v -> best
      }
    }
    lbl
  }

  test("planted two-clique bridge graph: communities match the sequential reference") {
    // Two triangles {1,2,3} and {4,5,6} bridged by 3–4. Every desired
    // co-order edge appears in exactly MinSupport orders (the
    // coOrderPairs support floor), nothing else co-occurs.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
                    (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val rows = for {
      (i, (a, b)) <- edges.zipWithIndex.map(_.swap)
      copy <- 0 until 2
      p <- Seq(a, b)
    } yield (1000L + i * 10L + copy, p)
    val dir = java.nio.file.Files.createTempDirectory("graft-lpa").toString
    rows.toDF("l_orderkey", "l_partkey")
      .withColumn("l_shipdate", to_timestamp_ntz(lit("2020-01-01")))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val adj = Map(
      1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L), 3L -> Seq(1L, 2L, 4L),
      4L -> Seq(3L, 5L, 6L), 5L -> Seq(4L, 6L), 6L -> Seq(4L, 5L))
    val want = refLpa(adj, LinkageQueries.LpaIters)
      .groupBy(_._2).map { case (lbl, m) =>
        lbl -> ((m.size.toLong, m.keys.min, m.keys.max))
      }

    val got = LinkageQueries.graphLabelPropagation(spark, dir).collect()
      .map(r => r.getAs[Long]("community") ->
        ((r.getAs[Long]("n_members"), r.getAs[Long]("member_min"),
          r.getAs[Long]("member_max")))).toMap
    assert(got == want, s"got $got\nwant $want")
    // The planted structure resolves: the left triangle coalesces onto
    // one label (the reference computes {1,2,3} -> 1 after 2 rounds), so
    // at least one community has 3 members.
    assert(got.values.exists(_._1 == 3L), s"no 3-member community in $got")
  }

  test("fixture graph: communities partition the node set") {
    val out = LinkageQueries.graphLabelPropagation(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 1L)
      assert(r.getAs[Long]("member_min") <= r.getAs[Long]("member_max"))
    }
    // Top-20 communities are returned largest-first.
    val sizes = out.map(_.getAs[Long]("n_members"))
    assert(sizes.sameElements(sizes.sortBy(-_)), "not size-ordered")
  }
}
