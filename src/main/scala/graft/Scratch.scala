package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text",
      k = 8, tokenize = Dedup.shingleTokenizer(3))
    val cands = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
    time("candidates count")(println("cands=" + cands.count()))
    time("curation run")(println(graft.pipeline.CurationPipeline
      .run(docs, "doc_id", "text", languages = Set.empty).counts))
    spark.stop()
  }
}
