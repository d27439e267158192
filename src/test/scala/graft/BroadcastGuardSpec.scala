package graft

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** The 100 TB broadcast rule as a blanket test (round-10 verdict #2): no
  * declared query may FORCE a broadcast of a relation that grows with the
  * corpus. A planner-forced broadcast is never demoted at runtime, so a
  * corpus-cardinality relation behind a `broadcast(...)` hint caps the
  * operator at the broadcast limit / driver memory the day the input is
  * real — while AQE elects broadcast on its own whenever the relation is
  * actually small, making the hint pure downside at scale.
  *
  * Enforcement: every broadcast hint in every declared query's analyzed
  * plan must be PROVABLY bounded by one of the structural rules below, or
  * carry an explicit justification in [[allow]]. The rules would have
  * flagged all five hints removed in round 11 (per-doc size tables, the
  * pack-chunks range carry, the simulated eval-shingle set, the fuzzy
  * join's block list), so a regression of that class cannot land silently.
  */
class BroadcastGuardSpec extends SparkSpec {

  /** Fixed-cardinality dimension tables (5 / 25 rows at every SF). */
  private val dimTables = Seq("region.parquet", "nation.parquet")

  /** Catalog-bounded enumeration columns: grouping on ONLY these yields a
    * row count bounded by the catalog (a handful of sources / languages),
    * independent of corpus row count. */
  private val boundedGroupCols = Set("source", "lang")

  /** Justified exceptions: query name → (max unproven hints, why bounded).
    * Every entry must cite a bound the structural rules cannot see. */
  private val allow: Map[String, (Int, String)] = Map(
    "mix_sources_budget" -> (1,
      "bucket carry: exactly 256 hex-prefix buckets per source by " +
        "construction (the sub-bucketed running sum), so the carry table " +
        "is 256 * |sources| rows at any corpus size"),
    "sim_ann_ivf" -> (2,
      "centroids (fixed k, derived from a seeded sample) and the " +
        "probe-to-centroid assignment (<= |probes| * nprobe rows; probes " +
        "are vec_id < 5 over the unique vec_id key)"),
    "sim_ann_lsh" -> (2,
      "probe set: vec_id < 5 over the unique vec_id key — <= 5 probes; " +
        "the multi-probe fan-out adds NTables*(1+nPlanes) rows per probe"),
    "sim_cosine_topk" -> (1,
      "probe set: vec_id < 5 over the unique vec_id key — <= 5 probes"),
    "events_lateness_histogram" -> (1,
      "per-day watermark prefix: one row per operational DAY (minutes " +
        "div 1440) — bounded by the stream's age, not its row count"),
    "point_get" -> (1,
      "present-keys projection: inner join of a literal key list against " +
        "the unique c_custkey — <= |keys| rows by key uniqueness"),
  )

  private def isDimScan(l: LogicalRelation): Boolean = l.relation match {
    case h: HadoopFsRelation =>
      h.location.rootPaths.forall(p => dimTables.exists(p.toString.contains))
    case _ => false
  }

  /** A subtree is provably bounded if (R1) every leaf is a literal
    * relation or a fixed-cardinality dim scan, (R2) it contains a Limit,
    * (R3) it contains a global (scalar) aggregate, or (R4) it contains an
    * aggregate grouped only on catalog-bounded enumeration columns. */
  private def provablyBounded(p: LogicalPlan): Boolean = {
    val leavesBounded = p.collectLeaves().forall {
      case _: LocalRelation | _: OneRowRelation | _: Range => true
      case l: LogicalRelation => isDimScan(l)
      case _ => false
    }
    leavesBounded || p.exists {
      case _: GlobalLimit | _: LocalLimit => true
      case a: Aggregate if a.groupingExpressions.isEmpty => true
      case a: Aggregate =>
        a.groupingExpressions.nonEmpty && a.groupingExpressions.forall {
          case ar: org.apache.spark.sql.catalyst.expressions.Attribute =>
            boundedGroupCols.contains(ar.name)
          case _ => false
        }
      case _ => false
    }
  }

  test("no declared query force-broadcasts a corpus-cardinality relation") {
    val offenders = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.analyzed
      val hints = plan.collect {
        case r: ResolvedHint if r.hints.strategy.contains(BROADCAST) => r
      }
      val unproven = hints.filterNot(h => provablyBounded(h.child))
      val allowed = allow.get(name).map(_._1).getOrElse(0)
      if (unproven.size > allowed)
        offenders += s"$name: ${unproven.size} unproven broadcast hint(s) " +
          s"(allowed $allowed) — first subtree:\n" +
          unproven.head.child.toString.linesIterator.take(8).mkString("\n")
      org.apache.spark.sql.graftx.Sessions.releaseSnapshots()
    }
    val bad = offenders.result()
    assert(bad.isEmpty, bad.mkString("\n\n"))
  }

  test("the allowlist carries no stale entries") {
    // An entry whose query no longer has that many unproven hints is a
    // silent hole the next regression walks through — keep it tight.
    val stale = allow.keys.filterNot(SparkEntry.queries.contains)
    assert(stale.isEmpty, s"allowlist names unknown queries: $stale")
  }
}
