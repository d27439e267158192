package graft

import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import graft.operators.Skew

/** Contracts of the salted-join skew remedy: result multiset identical
  * to the plain inner equi-join (the property the DuckDB oracle also
  * gates at query level), and the join actually runs on (key, salt) so
  * a hot key is spread across salt buckets — asserted with broadcasting
  * disabled, the regime the operator exists for.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def withNoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // 1000 rows, 90% on one hot key — the distribution that swamps a task.
  private lazy val big = (1 to 1000)
    .map(i => (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong))
    .toDF("k", "v")
  private lazy val small = Seq(("hot", 1L), ("k0", 2L), ("k3", 3L), ("zz", 9L))
    .toDF("k", "w")

  test("salted join result is identical to the plain inner join") {
    withNoBroadcast {
      val salted = Skew.saltedJoin(big, small, "k", 8)
        .select("k", "v", "w").collect().map(_.toSeq).sorted(RowOrd)
      val plain = big.join(small, Seq("k"))
        .select("k", "v", "w").collect().map(_.toSeq).sorted(RowOrd)
      assert(salted.length == 929) // 900 hot + 14 k0 + 15 k3 matches
      assert(salted.toSeq == plain.toSeq)
    }
  }

  test("join runs on (key, salt): two equi-keys, no broadcast") {
    withNoBroadcast {
      // sparkPlan, not executedPlan: AQE would wrap/replace nodes (see
      // DESIGN.md determinism notes on plan-shape assertions).
      val plan = Skew.saltedJoin(big, small, "k", 8).queryExecution.sparkPlan
      val joins = plan.collect {
        case j: SortMergeJoinExec    => j.leftKeys.length
        case j: ShuffledHashJoinExec => j.leftKeys.length
      }
      assert(joins.nonEmpty, s"no shuffled join found in:\n$plan")
      assert(joins.exists(_ == 2), s"expected a 2-key (key, salt) join, got key counts $joins")
    }
  }

  test("replicated small side matches every salt bucket (no lost rows vs salts)") {
    withNoBroadcast {
      // With salts=1 and salts=8 the result must agree — salt count is a
      // performance knob, never a semantics knob.
      val one = Skew.saltedJoin(big, small, "k", 1)
        .select("k", "v", "w").collect().map(_.toSeq).sorted(RowOrd)
      val eight = Skew.saltedJoin(big, small, "k", 8)
        .select("k", "v", "w").collect().map(_.toSeq).sorted(RowOrd)
      assert(one.toSeq == eight.toSeq)
    }
  }

  private object RowOrd extends Ordering[Seq[Any]] {
    def compare(a: Seq[Any], b: Seq[Any]): Int =
      a.map(_.toString).mkString("|").compare(b.map(_.toString).mkString("|"))
  }
}
