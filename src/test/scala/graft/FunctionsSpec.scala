package graft

import org.apache.spark.sql.functions._
import graft.functions.ColFns._

/** Unit specs for the portable-hash / quantized-math column library —
  * including cross-engine pins: constants verified against DuckDB by hand
  * so a Spark upgrade that silently changes semantics fails here rather
  * than in the oracle diff.
  */
class FunctionsSpec extends SparkSpec {

  import TestSpark.spark.implicits._

  test("qdot: codegen and interpreted paths agree with a hand-computed dot product") {
    val df = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
    val expected = 1L * 4 + 2 * 5 + 3 * 6
    assert(df.select(qdot(col("a"), col("b"))).head().getLong(0) == expected)
    // interpreted path (whole-stage codegen off)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.select(qdot(col("a"), col("b"))).head().getLong(0) == expected)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("qdot registers as a SQL function via GraftExtensions") {
    graft.functions.GraftExtensions.install(spark)
    Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
      .createOrReplaceTempView("qdot_vecs")
    val out = spark.sql("SELECT qdot(a, b) AS d FROM qdot_vecs").head().getLong(0)
    assert(out == 32L)
  }

  test("qdot: null array propagates null") {
    val df = Seq((Some(Array(1L, 2L)), Option.empty[Array[Long]])).toDF("a", "b")
    assert(df.select(qdot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("qnorm2 equals qdot(a, a)") {
    val df = Seq(Tuple1(Array(3L, 4L))).toDF("a")
    assert(df.select(qnorm2(col("a"))).head().getLong(0) == 25L)
  }

  test("md5Long matches the DuckDB hex-cast convention (cross-engine pin)") {
    // DuckDB: SELECT CAST('0x' || substring(md5('3:abc def'),1,8) AS BIGINT) = 1867797416
    val v = Seq("3:abc def").toDF("s").select(md5Long(col("s"))).head().getLong(0)
    assert(v == 1867797416L)
  }

  test("quantizeVec rounds half away from zero like both engines") {
    val df = Seq(Tuple1(Array(0.1234567f, -0.1234567f))).toDF("e")
    val q = df.select(quantizeVec(col("e"))).head().getSeq[Long](0)
    assert(q == Seq(123457L, -123457L))
  }

  test("nsToEpochSec uses integer division (no double rounding above 2^53)") {
    // 1704079804729045799 ns: double division would round up to ...805
    val df = Seq(1704079804729045799L).toDF("ts")
    assert(df.select(nsToEpochSec(col("ts"))).head().getLong(0) == 1704079804L)
  }

  test("floorDiv's positivity guard folds away for literal divisors") {
    // The hot constant-divisor path (nsToEpochSec etc.) relies on
    // ConstantFolding + SimplifyConditionals stripping the guard branch;
    // if a Spark upgrade stops folding it, every bucketing expression
    // pays a per-row comparison AND carries a raise_error into codegen
    // (round-13 ADVICE asked for exactly this plan assertion).
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen, RaiseError}
    val optimized = Seq(1L).toDF("ts").select(nsToEpochSec(col("ts")))
      .queryExecution.optimizedPlan
    val leftovers = optimized.expressions.flatMap(_.collect {
      case c: CaseWhen => c
      case r: RaiseError => r
    })
    assert(leftovers.isEmpty,
      s"literal-divisor floorDiv guard did not fold: $leftovers")
  }

  test("floorDiv raises the diagnostic message on zero, negative, and NULL divisors") {
    def failureMessage(divisor: java.lang.Long): String = {
      val ex = intercept[Exception] {
        Seq((10L, divisor)).toDF("a", "b")
          .select(floorDiv(col("a"), col("b"))).collect()
      }
      Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    }
    assert(failureMessage(0L).contains("floorDiv divisor must be positive, got 0"))
    assert(failureMessage(-3L).contains("floorDiv divisor must be positive, got -3"))
    // NULL divisor: b > 0 is null so the otherwise branch fires; without
    // the coalesce the concat would null the whole message and the error
    // surfaces as an opaque null rather than this diagnostic.
    assert(failureMessage(null).contains("floorDiv divisor must be positive, got null"))
  }
}
