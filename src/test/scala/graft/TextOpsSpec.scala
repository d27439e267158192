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
}
