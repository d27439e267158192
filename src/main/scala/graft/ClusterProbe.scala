package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: per-phase timing of the dedup_clusters lineage. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (i <- 1 to 2) {
      val df = t(s"rep$i loop (construction)") {
        graft.queries.DedupQueries.dedupClusters(spark, d)
      }
      t(s"rep$i final write") {
        df.write.mode("overwrite").format("noop").save()
      }
      if (i == 1) println("[probe] final plan:\n" +
        df.queryExecution.executedPlan.toString.linesIterator.take(12).mkString("\n"))
    }
    spark.stop()
  }
}
