package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Jaccard

/** Source-format coverage: the engine's operators are format-agnostic —
  * the same corpus ingested as parquet, CSV, and JSON lines must produce
  * identical results downstream.
  */
class SourceFormatSpec extends SparkSpec {
  import spark.implicits._

  private val dir = s"/tmp/graft-sources-${ProcessHandle.current().pid()}"

  test("parquet, csv and json sources feed identical results") {
    val docs = Seq(
      (1L, "the quick brown fox", "s1"),
      (2L, "pack my box, with five-dozen jugs!", "s2"),
      (3L, "the quick brown fox", "s1"))
      .toDF("doc_id", "text", "source")
    docs.write.mode("overwrite").parquet(s"$dir/p")
    docs.write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").csv(s"$dir/c")
    docs.write.mode("overwrite").json(s"$dir/j")

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    def sizesFrom(df: org.apache.spark.sql.DataFrame) =
      Jaccard.docSizes(Jaccard.tokenized(
        df.select(col("doc_id").as("docId"), col("text"))))
        .as[(Long, Long)].collect().toSet

    val fromParquet = sizesFrom(spark.read.parquet(s"$dir/p"))
    val fromCsv = sizesFrom(spark.read.schema(schema)
      .option("header", "true").csv(s"$dir/c"))
    val fromJson = sizesFrom(spark.read.schema(schema).json(s"$dir/j"))
    assert(fromParquet == fromCsv && fromCsv == fromJson)
    assert(fromParquet == Set((1L, 4L), (2L, 7L), (3L, 4L)))
  }

  test("orc round-trips with predicate pushdown and column pruning") {
    val docs = Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "delta epsilon", "s2"),
      (3L, "zeta eta theta iota", "s1"))
      .toDF("doc_id", "text", "source")
    docs.write.mode("overwrite").orc(s"$dir/o")
    val back = spark.read.orc(s"$dir/o")
    // row/value fidelity
    assert(back.orderBy("doc_id").as[(Long, String, String)].collect().toSeq
      == docs.orderBy("doc_id").as[(Long, String, String)].collect().toSeq)
    // the ORC scan honors the same pushdown/pruning contract as parquet:
    // the filter reaches the scan and the projection narrows the schema
    val narrow = back.filter(col("doc_id") > 1L).select("doc_id", "source")
    val scan = narrow.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters") &&
      scan.contains("GreaterThan(doc_id,1)"),
      s"ORC scan did not receive the pushed filter:\n$scan")
    assert(!scan.contains("text"), s"ORC scan reads the pruned column:\n$scan")
    assert(narrow.as[(Long, String)].collect().toSet
      == Set((2L, "s2"), (3L, "s1")))
  }
}
