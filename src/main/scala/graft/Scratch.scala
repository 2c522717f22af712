package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions}
import graft.operators.Dedup

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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val sf = "/root/testdata/sf0.1"

    def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

    time("q36_cosine_neardups")(q("q36_cosine_neardups").count())
    time("q40_knn_brute")(q("q40_knn_brute").count())
    time("q42_knn_lsh")(q("q42_knn_lsh").count())
    time("q35_ngram_neardups")(q("q35_ngram_neardups").count())
    spark.stop()
  }
}
