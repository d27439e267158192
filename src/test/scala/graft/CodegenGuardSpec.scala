package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{CodegenAudit, Sessions}

/** The silent-codegen-fallback guard (round-13 verdict #2): every declared
  * query's WholeStageCodegen stages must actually COMPILE and stay under
  * `spark.sql.codegen.hugeMethodLimit` — otherwise Spark falls back to
  * interpreted execution at runtime without failing anything (the
  * emb_kmeans 64 KB blowup ran interpreted for two rounds, ~1.1 s per
  * invocation, invisible to correctness, volume, and plan-shape gates
  * alike; only a stderr grep found it). [[CodegenAudit]] compiles each
  * stage's generated source exactly as an executor would, pre-execution.
  *
  * Deliberately-interpreted stages (the ≤ k-row kmeans centroid division,
  * any higher-order-function projection) never form WholeStageCodegen
  * nodes at all, so they need no allowlist here — this guard is solely
  * about stages that CLAIM codegen and would silently lose it.
  */
class CodegenGuardSpec extends SparkSpec {

  /** AQE-off clone: under AQE, codegen collapse happens per query stage
    * at materialization, so an un-executed adaptive plan has no
    * WholeStageCodegen nodes to audit. Codegen of a stage does not depend
    * on AQE — the stage boundaries may differ, but every wide projection
    * that can blow a generated method exists in both plan forms. */
  private lazy val auditSession = {
    val s = spark.newSession()
    Sessions.copyRuntimeConf(spark, s)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  private def hugeLimit: Int =
    spark.conf.get("spark.sql.codegen.hugeMethodLimit", "65535").toInt

  /** Queries with a JUSTIFIED over-limit or non-compiling stage would be
    * allowlisted here (name → reason). Empty by design — the declared
    * surface has none, and any future entry must explain why interpreted
    * execution of that stage is acceptable at 100 TB. */
  private val allow: Map[String, String] = Map.empty

  test("every declared query's codegen stages compile under the huge-method limit") {
    val offenders = Seq.newBuilder[String]
    var audited = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      Sessions.beginPlanCapture()
      val planned =
        try Right(fn(auditSession, sfDir).queryExecution.executedPlan)
        catch { case e: Throwable => Left(e) }
      val snapPlans = Sessions.endPlanCapture()
      planned match {
        case Right(plan) =>
          val reports = CodegenAudit.audit(plan +: snapPlans)
          audited += reports.size
          val bad = reports.filter(_.failed(hugeLimit))
          if (bad.nonEmpty && !allow.contains(name))
            offenders += s"$name:\n  ${bad.mkString("\n  ")}"
        case Left(e) =>
          offenders += s"$name: PLAN CONSTRUCTION FAILED: $e"
      }
      Sessions.releaseSnapshots()
    }
    // Vacuity guard: if the AQE-off clone ever stops producing
    // WholeStageCodegen nodes (a conf regression, a Spark behavior
    // change), the audit would see nothing and "pass" — the declared
    // surface carries hundreds of codegen stages, so a collapse to a
    // trickle means the audit is no longer looking at real plans.
    assert(audited >= 300,
      s"audit saw only $audited WholeStageCodegen stages across the " +
        "declared surface — the AQE-off audit session is not producing " +
        "codegen-collapsed plans")
    val bad = offenders.result()
    assert(bad.isEmpty,
      s"${bad.size} declared quer${if (bad.size == 1) "y" else "ies"} would " +
        s"silently de-codegen at runtime:\n${bad.mkString("\n")}")
  }

  test("the audit flags a deliberate 64KB-method blowup") {
    // Reconstructs the round-13 emb_kmeans failure shape: a wide
    // post-aggregate projection. After a HashAggregate the stage's input
    // lives in LOCAL VARIABLES (not a row), so CodegenContext cannot
    // split the projection into sub-methods — 64 output columns of
    // deeply-nested guarded floor divisions accumulate into one consume
    // method past the JVM's 64 KB bytecode limit, Janino throws, and at
    // runtime Spark would silently run the stage interpreted.
    import graft.functions.ColFns.floorDiv
    def chain(c: org.apache.spark.sql.Column, depth: Int): org.apache.spark.sql.Column =
      if (depth == 0) c else chain(floorDiv(c + 1L, col("n")), depth - 1)
    val wide = auditSession.range(100)
      .select((col("id") % 4).as("g"), col("id").as("v"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), (0 until 64).map(i => sum(col("v") + i).as(s"s$i")): _*)
      .select(col("g") +: (0 until 64).map(i => chain(col(s"s$i"), 8).as(s"o$i")): _*)
    val reports = CodegenAudit.audit(Seq(wide.queryExecution.executedPlan))
    assert(reports.nonEmpty, "repro plan has no WholeStageCodegen stage to audit")
    assert(reports.exists(_.failed(hugeLimit)),
      s"the deliberate blowup was NOT flagged — audit saw only: $reports")
  }
}
