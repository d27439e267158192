package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.core.Graft
import graft.operators.Skew
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Property-based invariants (SURVEY §5.2.3): results must not depend on
  * input order or partitioning — the reference implicitly asserts this by
  * running its whole suite at 1 and 4 MPI ranks (Makefile:53-58).
  * Native ScalaCheck Properties (sbt runs these alongside ScalaTest).
  */
object PropertySpec extends Properties("graft") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  property("mapreduce sum over [0,n) = n(n-1)/2") =
    forAll(Gen.choose(1L, 5000L)) { n =>
      val res = Graft.mapreduceRange[String, Long](
        Graft.fromRange(spark, 0, n),
        i => Iterator.single(("s", i)), _ + _).collect()
      res.toSeq == Seq(("s", n * (n - 1) / 2))
    }

  property("mapreduce invariant under permutation + partition count") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(-50, 50), Gen.choose(-100, 100)))) { xs =>
      val a = Graft.mapreduce[Int, Int, Int, Long](
        xs.toDS().repartition(1), (k, v) => Iterator.single((k % 5, v.toLong)), _ + _)
        .collect().toMap
      val b = Graft.mapreduce[Int, Int, Int, Long](
        scala.util.Random.shuffle(xs).toDS().repartition(7),
        (k, v) => Iterator.single((k % 5, v.toLong)), _ + _)
        .collect().toMap
      a == b
    }

  property("distinct keys idempotent and complete") =
    forAll(Gen.listOf(Gen.choose(-100, 100))) { xs =>
      val ds = xs.map(x => (x, 1L)).toDS()
      val once = Graft.distinctKeys(ds).collect().sorted.toSeq
      val twice = Graft.distinctKeys(
        Graft.distinctKeys(ds).map(k => (k, 1L))).collect().sorted.toSeq
      once == twice && once == xs.distinct.sorted
    }

  property("salted aggregation equals plain aggregation (skew recipe lossless)") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 3), Gen.choose(-100, 100)))) { xs =>
      val df = xs.toDF("k", "v")
      val plain = df.groupBy("k")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val salted = Skew.saltedAgg(df, "k", 8, Seq(
          ("s", sum(col("v")), (c: Column) => sum(c)),
          ("n", count(lit(1)), (c: Column) => sum(c))))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      salted == plain
    }
}
