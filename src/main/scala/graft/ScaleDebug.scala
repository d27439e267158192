package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe for the 10× scale investigation: rebuilds the
  * ScaleProbeSpec salted corpus, runs one dedup query at 1× and 10×, and
  * prints the POST-EXECUTION (AQE-final) physical plan plus wall time —
  * the tool that answers "which operator went superlinear".
  * Run: sbt "runMain graft.ScaleDebug [queryName] [documentsDir]"
  * (documentsDir defaults to $SPARK_GRAFT_SF_DIR, e.g. /root/testdata/sf0.1) */
object ScaleDebug {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("dedup_jaccard_on_lsh")
    val srcDir = args.lift(1).orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse(
      sys.error("pass the data dir as arg 2 or set SPARK_GRAFT_SF_DIR " +
        "(a dir containing documents.parquet)"))
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val dir1 = Files.createTempDirectory("graft-sd1").toString
    val dir10 = Files.createTempDirectory("graft-sd10").toString
    docs.write.mode("overwrite").parquet(s"$dir1/documents.parquet")
    def salted(tag: Int): DataFrame = docs.select(
      (col("doc_id") + tag * 100000000L).as("doc_id"),
      concat_ws(" ",
        transform(split(col("text"), " "), w => concat(w, lit(s"q$tag")))).as("text"),
      col("lang"), col("source"), col("n_chars"))
    (0 until 10).map(salted).reduce(_ union _)
      .write.mode("overwrite").parquet(s"$dir10/documents.parquet")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(f"stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
          f"time=${m.executorRunTime / 1000.0}%8.1fs " +
          f"gc=${m.jvmGCTime / 1000.0}%6.1fs " +
          f"in=${m.inputMetrics.recordsRead}%10d " +
          f"sR=${m.shuffleReadMetrics.recordsRead}%10d " +
          f"sW=${m.shuffleWriteMetrics.recordsWritten}%10d " +
          f"spill=${m.diskBytesSpilled / 1e6}%6.0fMB  ${si.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    val prevCcDebug = sys.props.get("graft.cc.debug")
    sys.props("graft.cc.debug") = "true"
    try {
      val q = SparkEntry.queries(qname)
      for ((label, dir) <- Seq("1x" -> dir1, "10x" -> dir10)) {
        stages.clear()
        val t0 = System.nanoTime()
        val df = q(spark, dir) // eager queries (dedup_clusters) do real work here
        df.write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000) // let stage-completed events drain
        println(f"=== $qname $label: $sec%.2f s ===")
        stages.toArray.map(_.toString).sorted.foreach(println)
        println(df.queryExecution.executedPlan.toString.take(25000))
      }
    } finally {
      prevCcDebug match {
        case Some(v) => sys.props("graft.cc.debug") = v
        case None => sys.props.remove("graft.cc.debug")
      }
    }
    spark.stop()
  }
}
