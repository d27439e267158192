package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: inspect how Spark reads the driver parquet (timestamp
  * logical types, list element types) so oracle SQL stays type-aligned. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$d/events.parquet")
    ev.printSchema()
    val or = spark.read.parquet(s"$d/orders.parquet")
    or.printSchema()
    ev.select(col("ts"), (col("ts") / 1000000000L).cast("long").as("sec"),
      (col("ts") / (3600L * 1000000000L)).cast("long").multiply(3600L).as("hour_epoch")
    ).show(3, false)
    or.select(col("o_orderdate"),
      unix_timestamp(col("o_orderdate")).as("e1")).show(3, false)
    or.select(min_by(col("o_totalprice"), col("o_orderkey"))).show()
    val em = spark.read.parquet(s"$d/embeddings.parquet")
    em.printSchema()
    em.select(
      aggregate(
        transform(col("embedding"), x => round(x.cast("double") * 1000000).cast("long")),
        lit(0L), (acc, x) => acc + x * x).as("norm_q")
    ).show(2)
    spark.sql("SELECT conv(substring(md5('3:abc def'),1,8),16,10) AS h").show(false)
    spark.stop()
  }
}
