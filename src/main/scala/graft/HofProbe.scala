package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ColFns._

/** Scratch main: measures whether the interpreted higher-order functions
  * (filter/transform — Catalyst cannot codegen lambdas) are a real cost in
  * the text/dedup map path, or whether md5 hashing dominates. Decides if a
  * native words/shingles Expression (QDotProduct precedent) would pay.
  * Usage: sbt "runMain graft.HofProbe [sfDir] [reps]" */
object HofProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, sfDir)

    def time(label: String, df: => DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm-up
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[hof] $label%-28s median ${ts.sorted.apply(reps / 2)}%.3f s  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }

    // 1. split only (fully codegen'd)
    time("split_only", docs.select(sum(size(split(col("text"), " ")))))
    // 2. words = filter(split) (one interpreted HOF)
    time("words_hof", docs.select(sum(size(words(col("text"))))))
    // 3. shingle construction (transform+sequence HOFs, no hashing)
    time("shingles_hof", docs.select(col("doc_id"), words(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(sum(size(shingles3(col("w"))))))
    // 4. full minhash base: shingles + explode + md5 + conv (the hot path)
    time("shingles_md5", docs.select(col("doc_id"), words(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(shingles3(col("w")))).as("s"))
      .select(sum(md5Long(col("s")))))
    spark.stop()
  }
}
