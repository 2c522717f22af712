package graft

import org.apache.spark.sql.functions._

import graft.operators.Jaccard

/** SURVEY §7.4 risk #2 — the reference family's one known 100×-scale
  * hazard: a hot word makes the pair stage quadratic in its document
  * frequency. Two escape hatches, both proven here:
  *   - df-pruning (`maxDocFrequency`) removes hot words before pairing
  *     (the standard similarity-join mitigation; changes results, opt-in);
  *   - AQE skew-join splitting keeps the surviving shuffle partitions
  *     balanced when a word is hot but below the pruning threshold.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("df-pruning bounds the hot-word pair explosion") {
    // every doc shares "hot"; the other tokens are unique per doc
    val docs = (1 to 200)
      .map(i => (i.toString, s"hot tok${i}a tok${i}b"))
      .toDF("docId", "text")
    val posts = Jaccard.postings(Jaccard.tokenized(docs))
    // unpruned: the hot word alone pairs all 200 docs quadratically
    assert(Jaccard.pairIntersections(posts).count() == 200L * 199 / 2)
    // pruned at df<=100: the hot word is dropped, unique tokens never
    // pair — the quadratic term is gone entirely
    assert(Jaccard.pairIntersections(posts, Some(100L)).count() == 0L)
  }

  test("AQE splits the skewed hot-word partition in the pair join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // production thresholds scaled down to fixture size: flag a
      // partition as skewed past 16 KiB and split it to ~8 KiB targets
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force the shuffled join AQE skew-handling applies to
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // one word in 4000 docs, 3000 singleton words: the hot word's
      // posting partition dwarfs the median
      val hot = (1 to 4000).map(i => ("hot", i.toString))
      val rest = (1 to 3000).map(i => (s"w$i", i.toString))
      val posts = (hot ++ rest).toDF("word", "docId")
      val pairs = Jaccard.pairIntersections(posts)
      // execute THIS QueryExecution (count() would plan its own), then
      // read the adaptive plan back out of it
      val n = pairs.queryExecution.toRdd.count()
      assert(n == 4000L * 3999 / 2)
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skew=true"),
        s"expected a skew-split SortMergeJoin in:\n${plan.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
