package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Static whole-stage-codegen audit (round-13 verdict #2): compile every
  * WholeStageCodegen stage of a plan WITHOUT running it and report the
  * result, so a silent runtime de-codegen is visible at test time.
  *
  * Why this exists: when a generated method exceeds the JVM's 64 KB
  * bytecode limit, Janino throws at compile time and Spark SILENTLY falls
  * back to interpreted execution for the whole stage
  * (`spark.sql.codegen.fallback`, default true); likewise a method over
  * `spark.sql.codegen.hugeMethodLimit` (default 65535) compiles but is
  * rejected and the stage runs interpreted. Both paths cost real time on
  * hot stages (the round-13 emb_kmeans case: a 64-column floorDiv
  * projection de-codegen'd the per-vector stage for two rounds, ~1.1 s
  * per run, invisible to every correctness/volume gate — only a stderr
  * grep found it). This audit makes that class of regression a FAILING
  * test: it generates and compiles each stage's source exactly as the
  * executor would, and reports the max method size Spark itself gates on.
  *
  * `CodeGenerator.compile` caches by source text, so auditing a large
  * query surface re-compiles only distinct stages. No jobs run: plans are
  * taken pre-execution (callers should disable AQE for the audited
  * session — under AQE, codegen collapse happens per query stage at
  * materialization, so an un-executed adaptive plan has no
  * WholeStageCodegen nodes to audit).
  */
object CodegenAudit {

  /** One WholeStageCodegen stage's audit result.
    * @param stageId   the plan's codegen stage id (matches the `*(id)`
    *                  markers in explain output)
    * @param rootNode  node name at the stage root — enough to locate it
    * @param maxMethodCodeSize max generated-method bytecode size, or -1
    *                  when compilation failed outright
    * @param error     the compile failure, when there was one */
  final case class StageReport(stageId: Int, rootNode: String,
      maxMethodCodeSize: Int, error: Option[String]) {
    def failed(hugeMethodLimit: Int): Boolean =
      error.isDefined || maxMethodCodeSize > hugeMethodLimit
    override def toString: String =
      s"stage $stageId ($rootNode): " +
        error.fold(s"maxMethodCodeSize=$maxMethodCodeSize")(e => s"COMPILE FAILED: $e")
  }

  private def kids(p: SparkPlan): Seq[SparkPlan] = (p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case qs: QueryStageExec => Seq(qs.plan)
    case o => o.children
  }) ++ p.subqueries

  private def wscNodes(plans: Seq[SparkPlan]): Seq[WholeStageCodegenExec] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean])
    val out = Seq.newBuilder[WholeStageCodegenExec]
    def walk(p: SparkPlan): Unit = if (seen.add(p)) {
      p match {
        case w: WholeStageCodegenExec => out += w
        case _ =>
      }
      kids(p).foreach(walk)
    }
    plans.foreach(walk)
    out.result()
  }

  /** Generate + compile every WholeStageCodegen stage reachable from
    * `plans` (descending AQE roots, stages, and subquery plans) and
    * return one report per stage. Never throws: a stage whose codegen or
    * compilation fails is REPORTED, which is the whole point. */
  def audit(plans: Seq[SparkPlan]): Seq[StageReport] =
    wscNodes(plans).map { w =>
      try {
        val (_, code) = w.doCodeGen()
        val (_, stats) = CodeGenerator.compile(code)
        StageReport(w.codegenStageId, w.child.nodeName, stats.maxMethodCodeSize, None)
      } catch {
        case e: Throwable =>
          StageReport(w.codegenStageId, w.child.nodeName, -1,
            Some(e.toString.linesIterator.take(2).mkString(" ").take(300)))
      }
    }
}
