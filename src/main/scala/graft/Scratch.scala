package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry point (not part of the driver contract). */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val dir = "/root/testdata/sf0.1"
    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val q20 = SparkEntry.queries("q20_jac_doc_sizes")
    time("q20 noop run1")(exec(q20(spark, dir)))
    time("q20 noop run2")(exec(q20(spark, dir)))
    val q21 = SparkEntry.queries("q21_jac_word_df")
    time("q21 noop")(exec(q21(spark, dir)))
    spark.stop()
  }
}
