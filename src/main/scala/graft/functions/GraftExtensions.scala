package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension wiring for the engine's custom Catalyst expressions —
  * the standard deployment path for a Spark-native library: users add
  * `spark.sql.extensions=graft.functions.GraftExtensions` and get `qdot`
  * as a first-class SQL function (codegen'd, no UDF), usable from
  * `spark.sql("SELECT qdot(a, b) ...")` as well as the Column API
  * (ColFns.qdot).
  *
  * The reference has no SQL surface at all (its API is C++ headers,
  * /root/reference/src/hpmr.h:1-10); this is the Spark-idiomatic
  * equivalent of linking the library in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.qdotFunction)
}

object GraftExtensions {

  /** (identifier, info, builder) for `qdot(arrA, arrB)` — exact integer
    * dot product of two quantized long arrays (QDotProduct). */
  val qdotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("qdot"),
     new ExpressionInfo(
       classOf[QDotProduct].getName, null, "qdot",
       """qdot(a, b) - Exact integer dot product of two ARRAY<BIGINT> values
         |over the shorter length. Returns NULL if either array is NULL.
         |NULL ELEMENTS inside an array contribute 0 to the sum (they are
         |read as zeros, not rejected) — feed fully non-null arrays such as
         |quantized embedding vectors.""".stripMargin,
       "> SELECT qdot(array(1L, 2L), array(3L, 4L));\n 11"),
     (args: Seq[Expression]) => {
       require(args.length == 2, s"qdot expects 2 arguments, got ${args.length}")
       QDotProduct(args(0), args(1))
     })

  /** Register on an already-built session (REPL / tests), equivalent to
    * having set spark.sql.extensions at session build time. */
  def install(spark: SparkSession): Unit =
    org.apache.spark.sql.graftx.Registry.registerFunction(
      spark, qdotFunction._1, qdotFunction._2, qdotFunction._3)
}
