package graft
import org.apache.spark.sql.SparkSession

/** Scratch main: plan inspection for the declared queries.
  * Usage: sbt "runMain graft.Probe <queryName>" */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("mr_sum_by_key")
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").explain("formatted")
    spark.stop()
  }
}
