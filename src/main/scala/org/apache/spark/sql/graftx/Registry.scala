package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** private[sql] access for function registration on an existing session —
  * `SparkSession.sessionState` is sql-private in Spark 4, so the helper
  * lives in the org.apache.spark.sql namespace like [[Bridge]]; no logic
  * of its own. The public path is `spark.sql.extensions` →
  * graft.functions.GraftExtensions, which needs no bridge. */
object Registry {
  def registerFunction(
      spark: SparkSession,
      ident: FunctionIdentifier,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
