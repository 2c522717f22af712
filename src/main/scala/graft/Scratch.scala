package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry point (not part of the driver contract):
  * `runMain graft.Scratch q20_jac_doc_sizes [sfDir]` times one fixture
  * query cold + warm through the same noop sink Bench uses and prints
  * its final adaptive plan.
  */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q20_jac_doc_sizes")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // "skew" replays the Bench jaccard_skew_hotword workload (not a
    // SparkEntry query) so its plan can be dumped and timed here too
    val q: (SparkSession, String) => DataFrame =
      if (name == "skew") { (s, _) =>
        val docs = s.range(20000).select(
          col("id").cast("string").as("docId"),
          concat_ws(" ", lit("hotzz"),
            concat(lit("a"), col("id")), concat(lit("b"), col("id")),
            concat(lit("c"), col("id")), concat(lit("d"), col("id"))).as("text"))
        graft.operators.Jaccard.allPairs(docs, maxDocFrequency = Some(1000L))
      }
      else if (name == "curation") { (s, d) =>
        val docs = s.read.parquet(s"$d/documents.parquet")
        graft.pipeline.CurationPipeline
          .run(docs, "doc_id", "text", languages = Set.empty).curated
      }
      // "ltr_pin" regenerates q244's pinned pairwise weights: trains
      // on the SF-independent fixture and prints each weight's exact
      // toString (paste into the q244 oracle as CAST('w' AS DOUBLE))
      else if (name == "ltr_pin") { (s, d) =>
        val (m, feats) = TextQueries.ltrPairwiseFixture(s, d)
        println(s"[scratch] ltr_pin bias: ${m.bias}")
        m.weights.foreach { case (f, w) =>
          println(s"[scratch] ltr_pin weight: $f -> $w")
        }
        graft.operators.Ltr.ltrRerank(feats, m, 5)
      }
      // "tm_noorder" times the q177 operator pipeline WITHOUT the
      // registry's final single-partition sort (the round-13 probe that
      // isolated the sort-sampling double-execution)
      else if (name == "tm_noorder") { (s, d) =>
        import graft.operators.Jaccard
        val docs = s.read.parquet(s"$d/documents.parquet")
          .select(col("doc_id").as("docId"), col("text"), col("source"))
        val idx = Jaccard.dfOrderedSets(
          Jaccard.tokenized(docs.filter(col("source") =!= "src0")))
        Jaccard.thresholdMatches(
          Jaccard.tokenized(docs.filter(col("source") === "src0")), idx, 0.9)
      }
      else SparkEntry.queries(name)
    val warmRuns = args.lift(2).map(_.toInt).getOrElse(1)
    time(s"$name cold")(exec(q(spark, dir)))
    // bare 'warm' for the default single run — the r01+ baseline
    // protocol lines in BASELINE.md grep for it; index only multi-run
    for (i <- 1 to warmRuns)
      time(if (warmRuns == 1) s"$name warm" else s"$name warm$i")(
        exec(q(spark, dir)))
    // execute THIS QueryExecution (a write would plan its own) so the
    // printed adaptive plan is the one that actually ran
    val df = q(spark, dir)
    df.queryExecution.toRdd.count()
    println(df.queryExecution.executedPlan.toString.take(60000))
    spark.stop()
  }
}
