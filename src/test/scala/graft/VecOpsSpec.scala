package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, StructField, StructType}
import org.apache.spark.sql.Row

import graft.functions.{ColFns, TextOps, VecOps}
import graft.sources.Tables

/** Equivalence pins for the codegen'd vector/digest primitives (round-19
  * optimization): [[graft.functions.QuantizeVec]] must be a drop-in for
  * `transform(v, x => round(x.cast("double") * scale).cast("long"))` and
  * [[graft.functions.Md5MinArray]] for
  * `array_min(transform(array_distinct(arr), md5))` — these sit under the
  * scan stage of every similarity/embedding/semdedup query and text_fingerprint,
  * so any divergence is a family-wide wrong answer. */
class VecOpsSpec extends SparkSpec {

  private def hofQuantize(c: Column, scale: Double): Column =
    transform(c, x => round(x.cast("double") * scale).cast("long"))

  test("QuantizeVec ≡ transform(round·cast) on every fixture embedding, both scales") {
    for (scale <- Seq(1000d, 1000000d)) {
      val df = Tables.embeddings(spark, sfDir)
        .select(VecOps.quantizeVec(col("embedding"), scale).as("a"),
          hofQuantize(col("embedding"), scale).as("b"))
      assert(df.filter(not(col("a") <=> col("b"))).count() == 0, s"scale=$scale diverged")
      // Schema must match the HOF form's exactly (element type + nullability)
      assert(df.schema("a").dataType == df.schema("b").dataType)
    }
  }

  test("QuantizeVec ≡ HOF on adversarial doubles: ties, shortest-repr rounding, negatives") {
    // HALF_UP over the SHORTEST DECIMAL representation (BigDecimal.valueOf):
    // 0.49999999999999994 rounds to 0 (not Math.round's 1); 2.5 → 3;
    // -2.5 → -3 (not HALF_EVEN's -2); 1e-3-scale near-ties exercise the
    // double multiply before the round.
    val vals = Seq(0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 0.49999999999999994,
      -0.49999999999999994, 2.675, -2.675, 0.0005, -0.0005, 1.0005, 4.2342,
      -3.99999, 0.0, -0.0, 1.23456789e7, -9.8765e6)
    val schema = StructType(Seq(StructField("v",
      ArrayType(DoubleType, containsNull = true), nullable = true)))
    val rows = Seq(Row(vals), Row(Seq(null, 1.5, null, -2.5)),
      Row(Seq.empty[Any]), Row(null))
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => r)), schema)
      .select(col("v"), VecOps.quantizeVec(col("v"), 1000d).as("a"),
        hofQuantize(col("v"), 1000d).as("b"))
    assert(df.filter(not(col("a") <=> col("b"))).count() == 0)
    assert(df.schema("a").dataType == df.schema("b").dataType)
  }

  test("QuantizeVec ≡ HOF on float input incl. null elements") {
    val schema = StructType(Seq(StructField("v",
      ArrayType(FloatType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(Seq(0.5f, -0.5f, 1.2345f, -3.9999f, 0.0f, 123.456f)),
      Row(Seq(null, 2.5f)), Row(Seq.empty[Any]), Row(null))
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => r)), schema)
      .select(VecOps.quantizeVec(col("v"), 1000000d).as("a"),
        hofQuantize(col("v"), 1000000d).as("b"))
    assert(df.filter(not(col("a") <=> col("b"))).count() == 0)
    assert(df.schema("a").dataType == df.schema("b").dataType)
  }

  test("QuantizeVec interpreted eval matches codegen path") {
    // Force the interpreted path through a filter that Catalyst cannot
    // codegen away: evaluate on a literal via eval().
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.QuantizeVec
    import org.apache.spark.sql.catalyst.expressions.Literal
    val arr = new GenericArrayData(Array[Any](0.5, -2.5, 1.0005, null))
    val lit = Literal.create(arr, ArrayType(DoubleType, containsNull = true))
    val out = QuantizeVec(lit, 1000d).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(out.numElements() == 4)
    assert(out.getLong(0) == 500L && out.getLong(1) == -2500L &&
      out.getLong(2) == 1001L && out.isNullAt(3))
  }

  test("Md5MinArray ≡ array_min(transform(array_distinct, md5)) on fixture shingles") {
    val df = Tables.documents(spark, sfDir)
      .select(ColFns.words(lower(trim(col("text")))).as("w"))
      .filter(size(col("w")) >= 3)
      .select(TextOps.ngramsConcat(col("w"), 3).as("sh"))
      .select(VecOps.md5MinArray(col("sh")).as("a"),
        array_min(transform(array_distinct(col("sh")), s => md5(s))).as("b"),
        array_min(transform(col("sh"), s => md5(s))).as("c"))
    assert(df.filter(not(col("a") <=> col("b")) || not(col("a") <=> col("c")))
      .count() == 0)
  }

  test("ZipScaleSub ≡ zip_with(x*scale - y) incl. length mismatch and null padding") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(LongType, containsNull = true), nullable = true),
      StructField("b", ArrayType(LongType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(Seq(1L, -2L, 3L, 0L), Seq(10L, 20L, -30L, 40L)),
      Row(Seq(5L, 6L), Seq(1L, 2L, 3L)),          // b longer: null-padded
      Row(Seq(5L, 6L, 7L), Seq(1L)),              // a longer: null-padded
      Row(Seq(null, 4L), Seq(2L, null)),          // null elements
      Row(Seq.empty[Any], Seq(9L)),
      Row(null, Seq(1L)), Row(Seq(1L), null))
    for (scale <- Seq(1L, 1000L)) {
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
        .select(VecOps.zipScaleSub(col("a"), col("b"), scale).as("x"),
          zip_with(col("a"), col("b"), (p, q) => p * scale - q).as("y"))
      assert(df.filter(not(col("x") <=> col("y"))).count() == 0, s"scale=$scale")
      assert(df.schema("x").dataType == df.schema("y").dataType)
    }
    // And on the fixture residual shape the sim_ivfpq chains run.
    val q = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VecOps.quantizeVec(col("embedding"), 1000d).as("qv"))
    val c = q.groupBy().agg(
      org.apache.spark.sql.functions.array(
        (0 until 64).map(i => min(element_at(col("qv"), i + 1))): _*).as("cm"))
    val df2 = q.crossJoin(broadcast(c))
      .select(VecOps.zipScaleSub(col("qv"), col("cm"), 1000L).as("x"),
        zip_with(col("qv"), col("cm"), (p, r) => p * 1000L - r).as("y"))
    assert(df2.filter(not(col("x") <=> col("y"))).count() == 0)
  }

  test("Md5MinArray edge cases: empty, null array, null elements, unicode") {
    import spark.implicits._
    val df = Seq(
      (1, Seq("a")), (2, Seq("b", "a", "b")), (3, Seq.empty[String]),
      (4, Seq("漢 字 ü", "… two")), (5, null)).toDF("id", "sh")
      .select(col("id"), VecOps.md5MinArray(col("sh")).as("a"),
        array_min(transform(col("sh"), s => md5(s))).as("b"))
    assert(df.filter(not(col("a") <=> col("b"))).count() == 0)
    // null elements are skipped exactly like array_min skips md5(null)
    val schema = StructType(Seq(StructField("sh",
      ArrayType(org.apache.spark.sql.types.StringType, containsNull = true))))
    val rows = Seq(Row(Seq(null, "x", null)), Row(Seq(null, null)))
    val df2 = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .select(VecOps.md5MinArray(col("sh")).as("a"),
        array_min(transform(col("sh"), s => md5(s))).as("b"))
    assert(df2.filter(not(col("a") <=> col("b"))).count() == 0)
  }
}
