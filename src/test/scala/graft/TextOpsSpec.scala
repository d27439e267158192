package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.sources.Tables

/** Equivalence pins for the codegen'd text primitives (round-18
  * optimization): [[graft.functions.SpaceWords]] must be a drop-in for
  * `filter(split(text, " "), _ =!= "")` and
  * [[graft.functions.NgramsConcat]] for the `transform(sequence(...),
  * concat_ws(...))` HOF form, on real fixture text AND adversarial
  * strings — these expressions sit under every declared text/dedup
  * query, so any divergence is an inventory-wide wrong answer. */
class TextOpsSpec extends SparkSpec {

  private def hofWords(c: org.apache.spark.sql.Column) =
    filter(split(c, " "), w => w =!= "")

  private def hofNgrams(w: org.apache.spark.sql.Column, n: Int) =
    transform(sequence(lit(0), size(w) - n), i =>
      concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*))

  test("SpaceWords ≡ filter(split) on every fixture document") {
    val df = Tables.documents(spark, sfDir)
      .select(TextOps.spaceWords(col("text")).as("a"),
        hofWords(col("text")).as("b"))
    assert(df.filter(not(col("a") <=> col("b"))).count() == 0)
    // And on the lowercased/trimmed variant textFingerprint uses.
    val df2 = Tables.documents(spark, sfDir)
      .select(TextOps.spaceWords(lower(trim(col("text")))).as("a"),
        hofWords(lower(trim(col("text")))).as("b"))
    assert(df2.filter(not(col("a") <=> col("b"))).count() == 0)
  }

  test("SpaceWords ≡ filter(split) on adversarial strings") {
    import spark.implicits._
    val cases = Seq(
      "", " ", "   ", "a", " a", "a ", "  a  b ", "a b c",
      "tab\tand\nnewline stay inside tokens",
      "múltiplé byté ütf8 … ✓ 漢字 two  spaces",
      "trailing space  ", "x" * 5000, ("y " * 2000).trim)
    val df = cases.toDF("text")
      .select(col("text"), TextOps.spaceWords(col("text")).as("a"),
        hofWords(col("text")).as("b"))
    assert(df.filter(not(col("a") <=> col("b"))).count() == 0)
    // null input → null output, both forms
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(TextOps.spaceWords(col("text")).as("a"), hofWords(col("text")).as("b"))
    val r = nulls.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("NgramsConcat ≡ HOF n-grams on fixture words, n = 3 and 8") {
    for (n <- Seq(3, 8)) {
      val df = Tables.documents(spark, sfDir)
        .select(TextOps.spaceWords(col("text")).as("w"))
        .filter(size(col("w")) >= n)
        .select(TextOps.ngramsConcat(col("w"), n).as("a"),
          hofNgrams(col("w"), n).as("b"))
      assert(df.filter(not(col("a") <=> col("b"))).count() == 0, s"n=$n diverged")
    }
  }

  test("NgramsConcat null elements: skipped the concat_ws way (ADVICE r18)") {
    import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(StructField("w",
      ArrayType(StringType, containsNull = true), nullable = true)))
    val rows = Seq(Row(Seq("a", null, "c", "d")), Row(Seq(null, null, null)),
      Row(Seq("x", "y", null)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .select(TextOps.ngramsConcat(col("w"), 3).as("a"),
        hofNgrams(col("w"), 3).as("b"))
    assert(df.filter(not(col("a") <=> col("b"))).count() == 0)
  }

  test("NgramsConcat edge cases: exactly-n words, below-n words, unicode") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b", "c"),
      Seq("漢", "字", "ü", "…"),
      Seq("one"),
      Seq.empty[String]).toDF("w")
    val got = df.select(TextOps.ngramsConcat(col("w"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c"))
    assert(got(1) == Seq("漢 字 ü", "字 ü …"))
    // Below the precondition the codegen form returns an EMPTY array —
    // every declared caller filters size(w) >= n first, so this branch
    // is unreachable there; pinned so the contract is explicit.
    assert(got(2) == Seq.empty && got(3) == Seq.empty)
  }

  test("declared schema parity: array element type and containsNull match") {
    val a = Tables.documents(spark, sfDir).select(TextOps.spaceWords(col("text")).as("w"))
    val b = Tables.documents(spark, sfDir).select(hofWords(col("text")).as("w"))
    assert(a.schema("w").dataType == b.schema("w").dataType)
  }

  // ---- round-19 HOF sweep: the gopher/scrub primitives ----

  private def hofSumLen(w: org.apache.spark.sql.Column) =
    aggregate(transform(w, x => length(x).cast("long")),
      lit(0L), (acc, x) => acc + x)

  private def hofAlpha(w: org.apache.spark.sql.Column) =
    size(filter(w, x => x.rlike("[a-z]"))).cast("long")

  private val blockW = Seq("the", "a", "of", "and", "to", "table", "row")

  private def hofScrub(w: org.apache.spark.sql.Column) =
    filter(w, x => !x.isin(blockW.map(t => t: Any): _*))

  test("SumCharLen / CountAsciiLowerWords / FilterOutWords ≡ HOF forms on fixture words") {
    val df = Tables.documents(spark, sfDir)
      .select(TextOps.spaceWords(col("text")).as("w"))
      .select(
        TextOps.sumCharLen(col("w")).as("a1"), hofSumLen(col("w")).as("b1"),
        TextOps.countAsciiLowerWords(col("w")).as("a2"), hofAlpha(col("w")).as("b2"),
        TextOps.filterOutWords(col("w"), blockW).as("a3"), hofScrub(col("w")).as("b3"))
    assert(df.filter(not(col("a1") <=> col("b1")) ||
      not(col("a2") <=> col("b2")) || not(col("a3") <=> col("b3"))).count() == 0)
    assert(df.schema("a3").dataType == df.schema("b3").dataType)
  }

  test("gopher stopword-kind count: sum of array_contains ≡ size(filter(stop-list))") {
    val stop = Seq("the", "a", "of", "and", "to")
    val df = Tables.documents(spark, sfDir)
      .select(TextOps.spaceWords(col("text")).as("w"))
      .select(
        stop.map(sw => when(array_contains(col("w"), lit(sw)), 1L)
          .otherwise(0L)).reduce(_ + _).as("a"),
        size(filter(typedLit(stop), x =>
          array_contains(col("w"), x))).cast("long").as("b"))
    assert(df.filter(not(col("a") <=> col("b"))).count() == 0)
  }

  test("round-19 primitives: adversarial arrays (nulls, empties, unicode, block hits)") {
    import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(StructField("w",
      ArrayType(StringType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(Seq("the", "quick", "브라운", "FOX", "…", "a1", "Z")),
      Row(Seq("table", "row", "of", "and")),
      Row(Seq.empty[Any]),
      Row(Seq(null, "x", "the")),
      Row(Seq(null, null)),
      Row(null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .select(
        TextOps.sumCharLen(col("w")).as("a1"), hofSumLen(col("w")).as("b1"),
        TextOps.countAsciiLowerWords(col("w")).as("a2"), hofAlpha(col("w")).as("b2"),
        TextOps.filterOutWords(col("w"), blockW).as("a3"), hofScrub(col("w")).as("b3"))
    // Note the null-array row too: under the engine's ANSI-default
    // sessions size(null) is NULL (the -1 legacy branch needs ANSI off),
    // so even n_alpha matches the HOF form there.
    assert(df.filter(not(col("a1") <=> col("b1")) ||
      not(col("a2") <=> col("b2")) || not(col("a3") <=> col("b3"))).count() == 0)
  }
}
