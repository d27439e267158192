package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runOnce(name: String): Boolean =
      try { SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
    // Warm the JVM (JIT, codegen compiler, parquet reader, shuffle paths)
    // on a few representative queries so the first timed query doesn't
    // absorb cold-start costs that belong to no query in particular.
    Seq("mr_sum_by_key", "sim_cosine_topk", "text_wordcount_topk").foreach(runOnce)
    // noop sink forces full query execution (count() would let Catalyst
    // prune ordering/projections and under-measure).
    // A failed query must not silently shrink the total: it is recorded
    // with its (meaningless) elapsed time AND named in "failed" so a
    // regression reads as broken, not fast.
    val timed = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      val ok = runOnce(name)
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val results = timed.map { case (n, t, _) => n -> t }.toMap
    val failed = timed.collect { case (n, _, false) => "\"" + n + "\"" }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
