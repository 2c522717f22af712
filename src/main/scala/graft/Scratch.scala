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

    time("q41_lsh_buckets")(q("q41_lsh_buckets").count())
    time("q34_simhash_neardups")(q("q34_simhash_neardups").count())
    time("q36_cosine_neardups")(q("q36_cosine_neardups").count())
    time("q35_ngram_neardups")(q("q35_ngram_neardups").count())
    time("q31_minhash_sig")(q("q31_minhash_sig").count())
    time("q32_lsh_candidates")(q("q32_lsh_candidates").count())
    println("===== q35 plan =====")
    println(q("q35_ngram_neardups").queryExecution.executedPlan.toString
      .linesIterator.take(60).mkString("\n"))
    spark.stop()
  }
}
