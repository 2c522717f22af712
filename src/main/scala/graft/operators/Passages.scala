package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The PERSISTED passage-index layout + lifecycle — passage-level
  * retrieval (Callan SIGIR'94 / Dai & Callan's MaxP) promoted from an
  * in-gate rebuild to the same ingest-maintained layout family as the
  * word index: a passage index is ~`width/stride`× the corpus volume
  * (q203's width-32/stride-16 shape doubles it, and the segmentation
  * re-tokenizes everything), so at 100 TB it MUST be built once at
  * ingest and maintained incrementally — never re-segmented per probe
  * batch.
  *
  * The layout is four tables, all derivable per micro-batch from the
  * batch's documents alone (every merge is the word-index machinery —
  * [[Retrieval.compactTermIndex]]'s append/delete contract — over
  * PASSAGE ids, which inherit the disjoint-ingest contract from doc
  * ids because `passageId = "<docId>:<idx>"`):
  *
  *   - `tf` — [[Retrieval.termFrequencies]] of the passages (the
  *     `docId` column HOLDS passage ids: the passage collection IS
  *     the corpus, so every word-index operator applies verbatim);
  *     persist `bucketBy(word)` like the document index;
  *   - `dfTab`/`stats` — passage-level df and (n_passages,
  *     total_dl): additive BIGINTs, the compaction cadence of the
  *     index they describe;
  *   - `membership` — `(passageId, docId)`: the MaxP evidence join
  *     key; appends with its documents, deletes with them.
  *
  * Reference behavior: jaccard-mapreduce has no passage retrieval;
  * this extends the repo's own q203 surface with the lifecycle every
  * other layout family already has.
  */
object Passages {

  /** The persisted passage-index layout (see object doc). Pass the
    * four tables MATERIALIZED (parquet/bucketed at ingest,
    * `localCheckpoint` in tests/gates) — every probe consumes `tf`
    * via the one posting join and the others broadcast-sized or
    * membership-sized.
    */
  final case class PassageLayout(tf: DataFrame, dfTab: DataFrame,
                                 stats: DataFrame, membership: DataFrame)

  /** Build the layout from scratch — segmentation
    * ([[Chunking.tokenPassages]]) + the word-index aggregates over
    * passage ids. One corpus pass; at ingest this runs per
    * micro-batch through [[compactPassageIndex]], never over the
    * full corpus.
    */
  def passageIndex(docs: DataFrame, idCol: String, textCol: String,
                   width: Int, stride: Int): PassageLayout = {
    val pass = Chunking.tokenPassages(docs, idCol, textCol, width, stride)
    val tf = Retrieval.termFrequencies(pass, "passageId", "text")
    PassageLayout(tf, Retrieval.dfTable(tf), Retrieval.corpusStats(tf),
      pass.select(col("passageId"), col("docId")))
  }

  /** Append-side compaction: merge a micro-batch's documents into a
    * persisted layout WITHOUT re-segmenting the corpus — the batch
    * segments alone, then [[Retrieval.compactTermIndex]] merges the
    * posting/df/stat tables (row-identical to a rebuild over the
    * union under disjoint doc ids — passage ids are then disjoint by
    * construction; PassageIndexSpec pins the parity, q235 gates a
    * probe through the compacted layout against the fresh-build
    * replay) and the membership rows append. `assertDisjoint`
    * enforces the ingest contract in-plan over PASSAGE ids (the
    * [[Retrieval.compactTermIndex]] guard).
    */
  def compactPassageIndex(layout: PassageLayout, batchDocs: DataFrame,
                          idCol: String, textCol: String,
                          width: Int, stride: Int,
                          assertDisjoint: Boolean = false)
      : PassageLayout =
    compactPassageIndex(layout,
      passageIndex(batchDocs, idCol, textCol, width, stride),
      assertDisjoint)

  /** [[compactPassageIndex]] over a PREBUILT batch layout — the form
    * an ingest loop uses when the batch's tables are already
    * materialized (the [[Retrieval.compactTermIndex]] "batchTf
    * consumed 3×, materialize once" rule lifted to the four-table
    * layout: the docs-based overload above derives every batch table
    * from one lazy segmentation chain, which re-runs per consumer).
    */
  def compactPassageIndex(layout: PassageLayout, batch: PassageLayout,
                          assertDisjoint: Boolean)
      : PassageLayout = {
    val (tf, dfTab, stats) = Retrieval.compactTermIndex(layout.tf,
      layout.dfTab, layout.stats, batch.tf, assertDisjoint)
    PassageLayout(tf, dfTab, stats,
      layout.membership.unionByName(batch.membership))
  }

  /** Deletion-side compaction: remove `deleteIds` DOCUMENTS from the
    * layout without a corpus pass — the membership table resolves the
    * doc ids to their passage ids (id-width work), then
    * [[Retrieval.compactTermIndexDeleted]] subtracts those passages
    * from the posting/df/stat tables exactly and the membership rows
    * anti-join away. Row-identical to a rebuild over the surviving
    * corpus (PassageIndexSpec pins it; q235 gates through a
    * post-delete layout). Ids absent from the index are no-ops.
    */
  def compactPassageIndexDeleted(layout: PassageLayout,
                                 deleteIds: DataFrame): PassageLayout = {
    val delPass = layout.membership
      .join(deleteIds.select(col("docId")), Seq("docId"), "left_semi")
      .select(col("passageId").as("docId"))
    val (tf, dfTab, stats) = Retrieval.compactTermIndexDeleted(layout.tf,
      layout.dfTab, layout.stats, delPass)
    PassageLayout(tf, dfTab, stats,
      layout.membership.join(deleteIds.select(col("docId")),
        Seq("docId"), "left_anti")
        // the equi-join key floats to the front — re-pin the layout's
        // (passageId, docId) column order so chained compactions'
        // unionByName and persisted schemas stay stable
        .select(col("passageId"), col("docId")))
  }

  /** MaxP document top-k THROUGH the persisted layout — the q203
    * probe with zero index-side aggregates in the plan: passages
    * score as pseudo-docs via [[Retrieval.bm25ScoresPrecomputed]]
    * (bit-identical to the inline-aggregate path — exact-integer
    * stats either way), each document ranks by its best passage
    * ([[Retrieval.maxPassageScores]] over the membership table), top
    * `k` per query. The probe plan is ONE posting join + the
    * result-sized membership join + the map-side-combined max.
    *
    * `maxDocFrequency` is the passage-level stop-term prune
    * ([[Retrieval.bm25ScoresPrecomputed]]'s, over PASSAGE df) — at
    * scale it is load-bearing, not optional: the segmentation
    * multiplies every hot term's posting volume by ~width/stride
    * (the 50k-doc ScaleBench probe measured 186 s unpruned vs 11 s
    * at the df cap the old in-gate arm always carried), so a
    * production passage probe prunes or WANDs, never scans the head.
    */
  def maxPassageTopK(layout: PassageLayout,
                     queries: DataFrame, qidCol: String, qtextCol: String,
                     k: Int, k1: Double = 1.2, b: Double = 0.75,
                     bitExact: Boolean = true,
                     maxDocFrequency: Option[Long] = None): DataFrame =
    Retrieval.bm25TopK(
      Retrieval.maxPassageScores(
        Retrieval.bm25ScoresPrecomputed(layout.tf, layout.dfTab,
          layout.stats, queries, qidCol, qtextCol, k1, b, bitExact,
          maxDocFrequency),
        layout.membership), k)
}
