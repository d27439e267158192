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

  property("asofJoin equals the brute-force as-of reference") =
    forAll(Gen.listOfN(12, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 30L), Gen.choose(1, 99))),
           Gen.listOfN(8, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 30L)))) { (qs, ps) =>
      import graft.operators.AsOf
      // unique (key, t) on the quote side, as the operator contract requires
      val quotes = qs.map { case (k, t, v) => ((k, t), v.toDouble) }.toMap.toSeq
        .map { case ((k, t), v) => (k, t, v) }
      val probes = ps.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val expected = probes.map { case (k, t, id) =>
        val m = quotes.filter(q => q._1 == k && q._2 <= t)
        id -> (if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
      }.toMap
      val got = AsOf.asofJoin(
          probes.toDF("k", "t", "id"), quotes.toDF("k", "t", "v"), "k", "t", "v")
        .collect().map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
      got == expected
    }

  property("rangeJoin equals the naive inequality join for any bin width") =
    forAll(Gen.listOfN(10, Gen.choose(0L, 50L)),
           Gen.listOfN(6, Gen.zip(Gen.choose(0L, 40L), Gen.choose(1L, 15L))),
           Gen.choose(1L, 20L)) { (pts, ivs, binWidth) =>
      import graft.operators.RangeJoin
      val intervals = ivs.map { case (s0, len) => (s0, s0 + len) }
      val expected = (for {
        t <- pts; (s0, e0) <- intervals if t >= s0 && t < e0
      } yield (t, s0)).toSet
      val got = RangeJoin.rangeJoin(
          pts.toDF("t"), "t", intervals.toDF("s", "e"), "s", "e", binWidth)
        .select("t", "s").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // multiset vs set: duplicate points/intervals collapse identically
      got == expected
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

  property("connected components equal a union-find reference on random graphs") =
    forAll(for {
      n <- Gen.choose(2, 20)
      edges <- Gen.nonEmptyListOf(
        Gen.zip(Gen.choose(0L, n.toLong - 1), Gen.choose(0L, n.toLong - 1)))
    } yield edges.filter(e => e._1 != e._2)) { edges =>
      edges.isEmpty || {
        val pairs = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
          .toDF("doc_a", "doc_b")
        val got = graft.operators.Components
          .connectedComponents(pairs, loopParts = 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // driver-side union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(v => v -> find(v)).toMap
        got == want
      }
    }
}
