package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.1")
    df.write.mode("overwrite").format("noop").save()
    println("PLAN-AFTER-EXEC")
    println(df.queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}
