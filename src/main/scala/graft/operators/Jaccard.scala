package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** All-pairs Jaccard similarity over a document corpus — the reference's
  * entire query surface (`DocumentSimilarityDriver.java:20-94`), re-expressed
  * as composable DataFrame operators forming ONE lazy DAG (no intermediate
  * materialization; Catalyst pipelines what the reference ran as three
  * MapReduce jobs with HDFS barriers).
  *
  * Scale notes (100 TB / 1000-executor design):
  *   - `docSizes` is a narrow projection (`size(tokens)`) — zero shuffle,
  *     unlike the reference's Job 1 which shuffled one record per unique
  *     token (`DocumentSimilarityMapper.java:27-31`).
  *   - `pairIntersections` uses the self-equi-join formulation rather than
  *     `collect_list` posting lists: a hot word's posting list would OOM a
  *     single task, while the join shuffles by word and lets AQE split skewed
  *     partitions. The quadratic blow-up itself is inherent to exact
  *     all-pairs; `maxDocFrequency` exposes the standard posting-list
  *     pruning used by similarity-join engines (opt-in — it changes results).
  *   - the size lookup is an inner equi-join; at test scale AQE broadcasts
  *     it automatically, at 100 TB (billions of docs) it degrades gracefully
  *     to a shuffled join. No hint is hard-coded.
  */
object Jaccard {

  /** docs(docId, text) → (docId, tokens) with empty-token docs dropped —
    * a doc with no tokens emits nothing in the reference
    * (`DocumentSimilarityMapper.java:29-31`) and can never pair.
    *
    * The empty-doc test is `lower(text) RLIKE '[a-z0-9]'`, NOT
    * `size(tokens) > 0`: predicate pushdown substitutes a filter's alias
    * references, so a size() filter over the tokens projection would
    * re-evaluate the whole tokenizer chain inside the scan filter. The
    * rlike form is equivalent (a token exists iff some lowercased char is
    * alphanumeric — checked on lower() so chars that only lowercase INTO
    * a-z, e.g. Kelvin K or Turkish İ, agree) and nearly free.
    */
  def tokenized(docs: DataFrame): DataFrame =
    docs
      .filter(lower(col("text")).rlike("[a-z0-9]"))
      .select(col("docId"), TextFunctions.normalizeTokens(col("text")).as("tokens"))

  /** A1 — |A| per document. Narrow: no shuffle at all. */
  def docSizes(tokenizedDocs: DataFrame): DataFrame =
    tokenizedDocs.select(col("docId"), size(col("tokens")).cast("long").as("size"))

  /** X1 — inverted-index postings `(word, docId)`, one row per unique
    * (doc, word). `Explode` is a Catalyst `Generator` — stays in codegen.
    *
    * OUTER explode, deliberately: `tokenized` guarantees `tokens` is
    * non-null and non-empty (the rlike filter), so outer and inner
    * explode emit identical rows — but a non-outer Generate makes the
    * optimizer infer `size(tokens) > 0 AND isnotnull(tokens)` beneath
    * it, and predicate pushdown substitutes the alias, re-evaluating
    * the whole regex tokenizer chain 2× inside the scan filter (3×
    * per row with the projection). Outer explode infers nothing; the
    * scan filter carries only the cheap rlike guard. Pinned by
    * PlanSpec ("tokenizer chain evaluates once per branch").
    */
  def postings(tokenizedDocs: DataFrame): DataFrame =
    tokenizedDocs.select(explode_outer(col("tokens")).as("word"), col("docId"))

  /** G1 — materialized posting lists `(word, [docId...] sorted)`.
    * Provided for parity with the reference's Job-2 reducer groups
    * (`DocumentSimilarityReducer.java:33-42`); the pair join below does
    * NOT go through this (a hot word's collected list can OOM one task —
    * the join formulation shuffles by word and lets AQE split skew).
    */
  def postingLists(postings: DataFrame): DataFrame =
    postings.groupBy("word")
      .agg(sort_array(collect_set(col("docId"))).as("docIds"))

  /** J2 + A2 — pair generation + intersection count.
    *
    * Self-equi-join the postings on `word` with a `docA < docB` residual
    * (unordered pairs once, byte-lexicographic orientation —
    * `DocumentSimilarityReducer.java:42-47`), then count shared words per
    * pair. Spark's `HashAggregate` does map-side partial aggregation
    * automatically (the combiner the reference declined,
    * `DocumentSimilarityDriver.java:55-56`).
    *
    * @param maxDocFrequency drop words appearing in more than this many
    *   docs before pairing (df-pruning for hot-word skew at scale).
    *   `None` = exact reference semantics.
    *
    *   The prune is an anti-join against the HOT-word table (df >
    *   maxDf), not an inner join against the vocabulary-sized keep
    *   list: hot words are bounded by |postings| / maxDf rows by
    *   construction, so the table is always tiny and broadcastable,
    *   and materializing it once (a small eager job) means the df
    *   aggregation's full pass over the postings runs ONCE — the
    *   keep-list formulation re-computed that aggregate under each
    *   self-join alias.
    */
  def pairIntersections(
      postings: DataFrame,
      maxDocFrequency: Option[Long] = None): DataFrame = {
    val p = maxDocFrequency match {
      case Some(maxDf) =>
        val hot = postings.groupBy("word").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf)
          .select("word")
          .localCheckpoint()
        // null-word postings (empty docs) survive the anti-join where
        // the inner join dropped them — harmless: a null word can never
        // equi-join in the pair stage, so the pair output is identical
        postings.join(broadcast(hot), Seq("word"), "left_anti")
      case None => postings
    }
    p.as("a")
      .join(p.as("b"),
        col("a.word") === col("b.word") && col("a.docId") < col("b.docId"))
      .groupBy(col("a.docId").as("docA"), col("b.docId").as("docB"))
      .agg(count(lit(1)).as("inter"))
  }

  /** P3 — the Jaccard score expression: `inter / (|A| + |B| - inter)`,
    * 0.0 when the union is empty (`DocumentSimilarityReducer.java:103-104`).
    */
  def jaccardScore(inter: Column, sizeA: Column, sizeB: Column): Column = {
    val union = sizeA + sizeB - inter
    when(union > 0, inter.cast("double") / union).otherwise(lit(0.0))
  }

  /** J1 + P3 — join pair counts with the size table (×2, inner: pairs with
    * unknown docs drop, `DocumentSimilarityReducer.java:99-101`) and score.
    * Output: (docA, docB, inter, sizeA, sizeB, similarity).
    */
  def similarities(pairCounts: DataFrame, sizes: DataFrame): DataFrame =
    pairCounts
      .join(sizes.withColumnRenamed("docId", "docA").withColumnRenamed("size", "sizeA"), "docA")
      .join(sizes.withColumnRenamed("docId", "docB").withColumnRenamed("size", "sizeB"), "docB")
      .select(
        col("docA"), col("docB"), col("inter"), col("sizeA"), col("sizeB"),
        jaccardScore(col("inter"), col("sizeA"), col("sizeB")).as("similarity"))

  /** End-to-end: docs(docId, text) → similarity table. One DAG. */
  def allPairs(docs: DataFrame, maxDocFrequency: Option[Long] = None): DataFrame = {
    val toks = tokenized(docs)
    similarities(pairIntersections(postings(toks), maxDocFrequency), docSizes(toks))
  }

  /** Top-k most-similar neighbors per document (extension query): both
    * orientations of each unordered pair, ranked per source doc.
    */
  def topKNeighbors(sims: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // both orientations via ONE generator pass over sims — a unionAll of
    // two selects would reference (and re-evaluate) the whole similarity
    // subtree twice
    val directed = sims.select(explode(array(
        struct(col("docA").as("doc"), col("docB").as("neighbor"), col("similarity")),
        struct(col("docB").as("doc"), col("docA").as("neighbor"), col("similarity"))))
        .as("e"))
      .select(col("e.doc").as("doc"), col("e.neighbor").as("neighbor"),
        col("e.similarity").as("similarity"))
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("similarity").desc, col("neighbor").asc)
    directed
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
