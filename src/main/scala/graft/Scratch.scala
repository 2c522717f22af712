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
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val res = graft.pipeline.CurationPipeline
      .run(docs, "doc_id", "text", languages = Set.empty)
    time("curated count")(println(res.curated.count()))
    val plan = res.curated.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    val reused = "ReusedExchange".r.findAllIn(plan).size
    val ngrams = "graft_word_ngrams".r.findAllIn(plan).size
    println(s"[scratch] FileScans=$scans ReusedExchanges=$reused ngramSites=$ngrams")
    // per-stage wall: just the near-dedup verification subchain
    spark.stop()
  }
}
