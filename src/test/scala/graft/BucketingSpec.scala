package graft

import org.apache.spark.sql.functions._

import graft.corpus.Corpus
import graft.operators.Jaccard

/** Bucketed-table layout: pre-partitioning the inverted index by word on
  * disk lets every downstream word-join run WITHOUT a shuffle — on a
  * cluster this is the difference between re-shuffling 100 TB per query
  * and reading co-located buckets.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("self-join on a word-bucketed posting table plans no shuffle") {
    val docs = Corpus.parse(
      (1 to 50).map(i => s"D$i tok${i % 7} tok${i % 5} tok${i % 3}")
        .toDF("value"))
    val posts = Jaccard.postings(Jaccard.tokenized(docs))

    spark.sql("DROP TABLE IF EXISTS posts_bucketed")
    posts.write.bucketBy(8, "word").sortBy("word")
      .mode("overwrite").saveAsTable("posts_bucketed")
    val t = spark.table("posts_bucketed")

    val joined = t.as("a").join(t.as("b"),
      col("a.word") === col("b.word") && col("a.docId") < col("b.docId"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed self-join must not shuffle:\n$plan")

    // and the result matches the shuffled formulation
    val bucketedPairs = Jaccard.pairIntersections(t)
      .orderBy("docA", "docB").collect().toSeq
    val plainPairs = Jaccard.pairIntersections(posts)
      .orderBy("docA", "docB").collect().toSeq
    assert(bucketedPairs == plainPairs)
  }
}
