package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions

/** Okapi BM25 lexical retrieval (Robertson et al., TREC-3; idf in the
  * non-negative `ln(1 + (N - df + 0.5)/(df + 0.5))` form Lucene ships) —
  * the sparse-retrieval companion to the ANN stack, and the scorer
  * behind retrieval-shaped curation jobs (eval-set decontamination by
  * top-k lookup, quality-by-retrievability, hard-negative mining).
  *
  * Scale shape: queries score against the corpus THROUGH the inverted
  * posting table, never query × corpus —
  *   - [[termFrequencies]] is ONE corpus pass to `(docId, dl, word,
  *     tf)`; like [[Jaccard.indexPostings]] this is the layout to
  *     persist (`bucketBy(word)`) so repeated query batches re-shuffle
  *     nothing on the corpus side;
  *   - document frequencies and the two corpus scalars (N, avgdl) fold
  *     into the QUERY-TERM table — query-batch-sized, so the one
  *     posting join carries everything it needs and AQE broadcasts it;
  *   - per-(query, doc) scores aggregate only over MATCHING postings;
  *     the fold is term-sorted (the DSIR convention) so the double sum
  *     is bit-reproducible at any partitioning and the DuckDB oracle
  *     replays the identical tree.
  */
object Retrieval {

  /** One corpus pass to the BM25 index: `(docId, dl, word, tf)` — term
    * frequency per (doc, term), `dl` = the document's total token
    * count (NOT deduped — BM25's length normalization wants real
    * length). Empty docs drop via the cheap scan-level rlike (the
    * `Jaccard.tokenized` idiom); the explode is outer + null-filtered
    * so an unmaterialized upstream's tokenizer chain is never
    * re-evaluated in a pushed-down size filter.
    */
  def termFrequencies(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs
      .filter(col(idCol).isNotNull && lower(col(textCol)).rlike("[a-z0-9]"))
      .select(col(idCol).as("docId"),
        TextFunctions.normalizedWords(col(textCol)).as("__ws"))
      .select(col("docId"), size(col("__ws")).cast("long").as("dl"),
        explode_outer(col("__ws")).as("word"))
      .filter(col("word").isNotNull)
      .groupBy(col("docId"), col("dl"), col("word"))
      .agg(count(lit(1)).as("tf"))

  /** BM25 scores of every query against every corpus document sharing
    * at least one term: `(queryId, docId, score)`. Builds the index
    * inline; ingest-style callers with a persisted [[termFrequencies]]
    * table use [[bm25ScoresIndexed]].
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 queries: DataFrame, qidCol: String, qtextCol: String,
                 k1: Double = 1.2, b: Double = 0.75,
                 bitExact: Boolean = true,
                 maxDocFrequency: Option[Long] = None): DataFrame =
    bm25ScoresIndexed(termFrequencies(docs, idCol, textCol),
      queries, qidCol, qtextCol, k1, b, bitExact, maxDocFrequency)

  /** [[bm25Scores]] over a pre-built (typically persisted,
    * word-bucketed) [[termFrequencies]] table. `tf` is referenced 3×
    * (df aggregate, length/scalar aggregate, posting join) — the
    * consumption contract of every indexed operator here: persisted
    * state at ingest, materialize-first for lazy one-off chains.
    *
    * Query terms are DEDUPED (`normalizeTokens` — the common BM25
    * practice of unit query-term weight); terms absent from the corpus
    * contribute zero to every score and are dropped by the inner df
    * join before they reach the postings.
    *
    * `bitExact` selects the fold (the Pca.covariance precedent):
    * `true` (default) sums each (query, doc)'s term contributions
    * term-sorted via a collected list — the partitioning-invariant,
    * oracle-replayable tree, but the list buffering defeats map-side
    * partial aggregation (measured OOM at 50k docs × 516 query-batch);
    * `false` is a plain codegen `sum` — map-side-combined, the scale
    * form, identical to ~1e-12 relative (RetrievalSpec pins parity).
    *
    * `maxDocFrequency` drops query terms with corpus df above the cap
    * BEFORE the posting join — classic stop-term pruning. The matched
    * posting volume (the whole probe cost: measured 42 s for a
    * 516-query batch × 50k docs unpruned, dominated by ~90M common-
    * word postings) collapses to the rare-term matches. Opt-in, it
    * changes results: scores equal a query stripped of its hot terms
    * (low-idf contributions, but not zero — RetrievalSpec pins the
    * equivalence), and docs sharing ONLY hot terms with the query
    * leave the result. The filter is query-term-table-sized — free.
    */
  def bm25ScoresIndexed(tf: DataFrame,
                        queries: DataFrame, qidCol: String, qtextCol: String,
                        k1: Double = 1.2, b: Double = 0.75,
                        bitExact: Boolean = true,
                        maxDocFrequency: Option[Long] = None): DataFrame = {
    require(k1 >= 0 && b >= 0 && b <= 1, s"k1 >= 0, b in [0,1]: $k1, $b")
    // (word, doc) rows are unique by construction, so count IS df
    val dfTab = tf.groupBy("word").agg(count(lit(1)).as("df"))
    // dl is functional on docId; the scalars use an EXPLICIT exact
    // integer sum / count division (one rounding, replayable) rather
    // than avg() whose accumulation is engine-internal
    val lens = tf.groupBy("docId").agg(max(col("dl")).as("dl"))
    val stats = lens.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"))
    val qTerms = queries
      .filter(col(qidCol).isNotNull && lower(col(qtextCol)).rlike("[a-z0-9]"))
      .select(col(qidCol).as("queryId"),
        TextFunctions.normalizeTokens(col(qtextCol)).as("__qt"))
      .select(col("queryId"), explode_outer(col("__qt")).as("word"))
      .filter(col("word").isNotNull)
    // idf + scalars fold into the query-term table (query-batch-sized:
    // the posting join needs nothing else); the optional stop-term
    // prune rides the same tiny table
    val kept = maxDocFrequency match {
      case Some(maxDf) => dfTab.filter(col("df") <= maxDf)
      case None => dfTab
    }
    val enriched = qTerms
      .join(kept, Seq("word"))
      .crossJoin(broadcast(stats))
      .select(col("queryId"), col("word"), col("avgdl"),
        log(lit(1.0) +
          (col("n_docs") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))).as("idf"))
    val contrib = tf.join(enriched, Seq("word"))
      .select(col("queryId"), col("docId"), col("word"),
        (col("idf") *
          (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0) - lit(b) +
              lit(b) * col("dl").cast("double") / col("avgdl"))))
          .as("__c"))
    // term-sorted fold (the q98/DSIR convention): bit-reproducible at
    // any partitioning, and the oracle replays the identical tree;
    // scale form: plain map-side-combined sum
    if (bitExact)
      contrib.groupBy(col("queryId"), col("docId"))
        .agg(sort_array(collect_list(struct(col("word"), col("__c"))))
          .as("__cs"))
        .select(col("queryId"), col("docId"),
          aggregate(col("__cs"), lit(0.0),
            (a, x) => a + x.getField("__c")).as("score"))
    else
      contrib.groupBy(col("queryId"), col("docId"))
        .agg(sum(col("__c")).as("score"))
  }

  /** Top-k documents per query from a [[bm25Scores]] table: score
    * descending, docId ascending ties (exact-duplicate docs produce
    * bitwise-equal scores, so the tie-break is deterministic) — the
    * AnnQueries ranking convention: rank on the FULL-precision value,
    * round only what is emitted. (An earlier form ranked on the 6-dp
    * rounded score "for portability"; that moved the one operation
    * whose decimal-string vs float-multiply implementations can
    * disagree across engines INTO the integer rank key — strictly
    * worse than ranking the raw doubles the oracle already replays.)
    */
  def bm25TopK(scores: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k > 0: $k")
    val w = Window.partitionBy(col("queryId"))
      .orderBy(col("score").desc, col("docId").asc)
    scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Reciprocal-rank fusion (Cormack et al. SIGIR'09): combine any
    * number of per-query rankings — BM25, an ANN list, a Jaccard
    * neighbor list — into one, scoring each (query, doc) by
    * `Σ 1/(k0 + rank_i)` over the lists it appears in (absent = zero)
    * and re-ranking. RRF needs only RANKS, never the component scores,
    * so it fuses rankings whose score scales are incomparable — the
    * standard hybrid-retrieval combiner and deliberately the simplest.
    *
    * Inputs are `(queryId, docId, rank)` tables ([[bm25TopK]]'s
    * shape). Output: `(queryId, docId, rrf_score, rank)`, top `k` per
    * query, score descending with docId ascending ties.
    *
    * Scale shape: everything is result-set-sized — a union of the
    * (already top-k-bounded) rankings, one (queryId, docId) aggregate,
    * one per-query rank window. The fold is source-index-sorted (at
    * most |rankings| elements per pair), so the double sum is
    * bit-reproducible and exactly replayable: every contribution is
    * `1.0 / (k0 + rank)` — one division on exact integers, no
    * transcendentals, so fused scores agree bitwise across engines.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "at least one ranking")
    require(k > 0 && k0 >= 0, s"k > 0, k0 >= 0: $k, $k0")
    val contribs = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("queryId"), col("docId"), lit(i).as("__src"),
        (lit(1.0) / (lit(k0).cast("double") + col("rank").cast("double")))
          .as("__rrf"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("queryId"))
      .orderBy(col("rrf_score").desc, col("docId").asc)
    contribs.groupBy(col("queryId"), col("docId"))
      .agg(sort_array(collect_list(struct(col("__src"), col("__rrf"))))
        .as("__xs"))
      .select(col("queryId"), col("docId"),
        aggregate(col("__xs"), lit(0.0),
          (a, x) => a + x.getField("__rrf")).as("rrf_score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
