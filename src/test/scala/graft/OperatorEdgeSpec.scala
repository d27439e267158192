package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, RangeJoin}

/** Edge-input behavior of the composed operators, pinned against what a
  * native implementation would do (the oracle queries only exercise the
  * clean fixture paths).
  */
class OperatorEdgeSpec extends SparkSpec {

  import TestSpark.spark.implicits._

  test("asofJoin: a null-timestamp quote matches nothing (native probe_t >= NULL semantics)") {
    val quotes = Seq((1L, Option(10L), 100.0), (1L, Option.empty[Long], 999.0))
      .toDF("k", "t", "price")
    val probes = Seq((1L, 5L), (1L, 15L)).toDF("k", "t")
    val out = AsOf.asofJoin(probes, quotes, "k", "t", "price")
      .collect().map(r => r.getLong(1) -> Option(r.get(2))).toMap
    // Probe at 5 precedes every real quote: null, NOT the null-t quote's
    // 999.0 (which under ASC NULLS FIRST would otherwise leak into every
    // early probe). Probe at 15 sees the t=10 quote.
    assert(out(5L).isEmpty, s"early probe must carry no value, got ${out(5L)}")
    assert(out(15L).contains(100.0))
  }

  test("asofJoin: a null-timestamp probe joins null") {
    val quotes = Seq((1L, 10L, 100.0)).toDF("k", "t", "price")
    val probes = Seq((1L, Option(15L)), (1L, Option.empty[Long])).toDF("k", "t")
    val out = AsOf.asofJoin(probes, quotes, "k", "t", "price").collect()
    assert(out.length == 2)
    val byT = out.map(r => Option(r.get(1)) -> r.isNullAt(2)).toMap
    assert(byT(Some(15L)) == false)
    assert(byT(None) == true, "null-t probe must join null, not the first quote")
  }

  test("rangeJoin: inverted and null-bounded intervals match nothing instead of exploding") {
    val points = Seq((1L, 100L)).toDF("id", "t")
    val intervals = Seq(
      (10L, Option(50L), Option(150L)),          // valid: contains t=100
      (11L, Option(1000000000L), Option(0L)),    // inverted: would explode ~555k bins
      (12L, Option.empty[Long], Option(150L)))   // null start
      .toDF("iid", "s", "e")
    val out = RangeJoin.rangeJoin(points, "t", intervals, "s", "e", 1800L)
      .select("iid").as[Long].collect().toSeq
    assert(out == Seq(10L), s"got $out")
  }

  test("rangeJoin and saltedAgg reject reserved working columns") {
    val pts = Seq((1L, 2L)).toDF("t", "__pbin")
    intercept[IllegalArgumentException](
      RangeJoin.rangeJoin(pts, "t", Seq((0L, 1L)).toDF("s", "e"), "s", "e", 10L))
    val df = Seq((1L, 2L)).toDF("k", "__salt")
    intercept[IllegalArgumentException](
      graft.operators.Skew.saltedAgg(df, "k", 4, Seq(("n", count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)))))
  }
}
