package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextFunctions}

/** Benchmark decontamination: find training-corpus documents whose word
  * n-gram overlap with any held-out benchmark/eval document exceeds a
  * coverage threshold — the standard pre-training hygiene pass that keeps
  * eval data out of the training set.
  *
  * Cross-corpus posting-list formulation: both sides explode to distinct
  * `(id, shingle)` postings and meet in a shingle equi-join, so a
  * (doc, benchmark) pair is only materialized when it shares at least one
  * shingle — the all-pairs `corpus × benchmarks` product never exists.
  * The shuffle key is the shingle (content-hashed, balanced under
  * document-length skew), and the benchmark side is tiny in practice
  * (thousands of eval docs vs billions of training docs), so AQE plans its
  * postings as the broadcast side and the corpus postings never shuffle at
  * all. `coverage = shared / bench_size` is the fraction of the
  * benchmark's distinct shingles present in the corpus doc — overlap is
  * measured against the SMALL side, so a long training doc can't dilute
  * its way under the threshold.
  */
object Decontaminate {

  /** Pairs `(doc id, benchmark id, shared, bench_sz, coverage)` with
    * `coverage >= minCoverage`. Both inputs must carry `idCol` and
    * `textCol`; ids should be disjoint across the two frames (a doc
    * paired with itself is legitimate decontamination output, not an
    * error, but usually means the benchmark leaked into the corpus
    * upstream).
    *
    * `maxShingleDf`: optional stop-gram cap — shingles occurring in more
    * than this many CORPUS documents are dropped from both sides before
    * the join. Ubiquitous n-grams ("it is the", boilerplate headers)
    * contribute no contamination signal but dominate the join fan-out at
    * scale; the cap bounds any single shingle's pair contribution by
    * `maxShingleDf × |benchmark postings|`. Off by default: with it on,
    * `shared` undercounts by the dropped shingles (documented estimator
    * trade-off, same knob as `Jaccard.pairIntersections(maxDocFrequency)`).
    *
    * `minCoverage` must be positive: a zero-overlap pair is
    * unrepresentable in the posting-list formulation (exactly the rows
    * any useful threshold discards).
    */
  def ngramOverlap(corpus: DataFrame, benchmarks: DataFrame,
                   idCol: String, textCol: String,
                   n: Int,
                   minCoverage: Double,
                   maxShingleDf: Option[Long] = None): DataFrame = {
    require(minCoverage > 0.0,
      "posting-list overlap join cannot emit zero-overlap pairs; " +
        "use a positive coverage threshold")
    GraftFunctions.register(corpus.sparkSession)

    def shingleSets(docs: DataFrame): DataFrame = docs
      // cheap empty-doc filter BEFORE the tokenizer projection (see
      // Dedup.minHashSignatures for the pushdown-duplication rationale)
      .filter(lower(col(textCol)).rlike("[a-z0-9]"))
      .select(col(idCol),
        TextFunctions.normalizedWords(col(textCol)).as("ws"))
      .select(col(idCol),
        array_distinct(GraftFunctions.wordNGrams(col("ws"), n))
          .as("shingles"))

    // outer explodes throughout: shingles is non-empty after the rlike
    // filter (n-gram kernel emits ≥1 window), and inner Generate would
    // infer filters that pushdown expands into a doubled tokenizer chain
    // inside the scan filter
    val cPosts = shingleSets(corpus)
      .select(col(idCol), explode_outer(col("shingles")).as("shingle"))
    val bSets = shingleSets(benchmarks)
    // shingles are distinct per doc, so |set| = size() on the array —
    // no second aggregation over the benchmark postings
    val bSizes = bSets.select(col(idCol).as("bench_id"),
      size(col("shingles")).cast("long").as("bench_sz"))
    val bPosts = bSets
      .select(col(idCol).as("bench_id"),
        explode_outer(col("shingles")).as("shingle"))

    val pruned = maxShingleDf match {
      case None => cPosts
      case Some(cap) =>
        // corpus-side document frequency; the semi-ish join keeps only
        // postings of sub-cap shingles (one extra shuffle by shingle,
        // which the main join needs anyway)
        val keep = cPosts.groupBy(col("shingle"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap)
          .select(col("shingle"))
        cPosts.join(keep, "shingle")
    }

    pruned
      .join(bPosts, "shingle")
      .groupBy(col(idCol), col("bench_id"))
      .agg(count(lit(1)).as("shared"))
      .join(bSizes, "bench_id")
      .withColumn("coverage",
        col("shared").cast("double") / col("bench_sz"))
      .filter(col("coverage") >= minCoverage)
      .select(col(idCol), col("bench_id"), col("shared"),
        col("bench_sz"), col("coverage"))
  }
}
