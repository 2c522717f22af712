package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer training as a Spark pipeline.
  *
  * The 100 TB shape of BPE training is asymmetric: ONE pass over the
  * corpus collapses it to a `(word, freq)` vocabulary (Zipf-bounded —
  * millions of rows where the corpus has trillions of tokens), and every
  * subsequent merge iteration touches only that vocabulary table. The
  * corpus is never re-read and never shuffled by content; the per-merge
  * argmax is a single-row collect off a pair table bounded by
  * |symbol alphabet|², and the symbol rewrite is a codegen'd HOF fold
  * over word-length arrays. This is exactly how published BPE trainers
  * (Sennrich et al., "Neural Machine Translation of Rare Words with
  * Subword Units") stay tractable: train on counts, not on text.
  */
object Bpe {

  /** The corpus-scale stage: word-occurrence counts over the normalized
    * tokenizer stream. Map-side partial aggregation means the shuffle
    * carries one row per (partition, distinct word) — vocabulary-sized,
    * not corpus-sized. The rlike pre-filter plus `explode_outer` keeps
    * the tokenizer chain out of scan filters (see
    * [[Dedup.minHashSignatures]] for the trap this avoids).
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .filter(lower(col(textCol)).rlike("[a-z0-9]"))
      .select(TextFunctions.normalizedWords(col(textCol)).as("__ws"))
      .select(explode_outer(col("__ws")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Adjacent-pair statistics over a `(syms, freq)` vocabulary: every
    * occurrence of symbol pair (l, r) inside a word counts `freq` times
    * (within-word multiplicity preserved — "aaa" holds (a,a) twice).
    * Shuffle key is the pair itself, so the aggregation is bounded by
    * the square of the live symbol alphabet regardless of corpus size.
    */
  def pairStats(vocab: DataFrame, symsCol: String,
                freqCol: String): DataFrame =
    vocab
      .select(col(freqCol).as("__freq"),
        // adjacent pairs via two shifted slices zipped together;
        // slice length is size-1 ≥ 0, so single-symbol words yield an
        // empty pair list (and explode_outer's null row is dropped on
        // the generator OUTPUT attribute — scan-filter safe)
        explode_outer(zip_with(
          slice(col(symsCol), lit(1), size(col(symsCol)) - 1),
          slice(col(symsCol), lit(2), size(col(symsCol)) - 1),
          (l, r) => struct(l.as("l"), r.as("r")))).as("__p"))
      .where(col("__p").isNotNull)
      .groupBy(col("__p.l").as("left_sym"), col("__p.r").as("right_sym"))
      .agg(sum(col("__freq")).as("pair_count"))

  /** First-merge pair statistics straight off a corpus: word counts,
    * initial character symbols, pair aggregation. This is iteration 0
    * of BPE training and the oracle-gated readout (q103).
    */
  def initialPairStats(docs: DataFrame, textCol: String): DataFrame =
    pairStats(
      wordCounts(docs, textCol)
        .select(initialSymbols("word").as("syms"), col("freq")),
      "syms", "freq")

  /** A word's initial symbol array: its characters. `split` on the empty
    * pattern plus an empty-string filter is portable across the
    * trailing-empty edge; the tokenizer guarantees non-empty words.
    */
  private def initialSymbols(wordCol: String) =
    filter(split(col(wordCol), ""), c => c =!= "")

  /** One BPE merge applied to a symbol-array column: the left-to-right
    * non-overlapping rewrite fusing every adjacent (l, r) into `l+r`
    * ("aaa" + merge (a,a) → [aa, a]). `get` returns null off the end of
    * an empty accumulator, and null comparisons fall through to the
    * otherwise branch — ANSI-safe. Shared by training (one rewrite per
    * learned merge) and encoding (the rank-ordered fold in
    * [[encodeSymbols]]).
    */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(get(acc, size(acc) - 1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** BPE-encode a symbol array with a trained merge table: apply the
    * merges one at a time in rank order. For a merge list produced by
    * [[learnMerges]] this is equivalent to the priority-queue encoder
    * (repeatedly merge the lowest-rank pair present): fusing two
    * symbols never creates a new adjacency between two OLD symbols, and
    * merge k's pair only mentions symbols from merges < k, so once the
    * pass for merge k is done its pair can never reappear.
    */
  def encodeSymbols(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (c, (l, r)) => applyMerge(c, l, r) }

  /** Encode the corpus VOCABULARY, not the corpus: one row per distinct
    * word with its BPE pieces and piece count. This is the 100 TB
    * encode shape — the per-word merge fold (the imperative heart of
    * BPE) runs once per distinct word (Zipf-bounded), and mapping the
    * corpus itself to token streams is then a plain broadcast join of
    * this table against the tokenizer output (see q93's
    * numericalization for the join-side shape). Output:
    * `(word, freq, pieces, n_pieces)`.
    */
  def encodeWords(docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame =
    wordCounts(docs, textCol)
      .select(col("word"), col("freq"),
        encodeSymbols(initialSymbols("word"), merges).as("pieces"))
      .withColumn("n_pieces", size(col("pieces")))

  /** Per-document BPE token counts: map the corpus onto the encoded
    * vocabulary of [[encodeWords]] and sum piece counts per document —
    * the "how many tokens is this corpus under tokenizer X" question
    * every pretraining budget starts from. Output:
    * `(id, n_words, n_bpe_tokens)`.
    *
    * Scale shape: the per-word merge fold runs once per DISTINCT word;
    * the corpus meets the resulting `(word, n_pieces)` table in a plain
    * token-keyed equi-join (the q93 numericalization shape — AQE
    * broadcasts the vocabulary when it fits) and re-aggregates by
    * document with map-side combine.
    */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    val enc = encodeWords(docs, textCol, merges)
      .select(col("word"), col("n_pieces"))
    docs
      .filter(col(idCol).isNotNull && lower(col(textCol)).rlike("[a-z0-9]"))
      .select(col(idCol), TextFunctions.normalizedWords(col(textCol)).as("__ws"))
      .select(col(idCol), explode_outer(col("__ws")).as("word"))
      // inner join: the vocabulary is built from this very corpus, so
      // every non-null word matches; the explode_outer null rows for
      // empty documents drop here
      .join(enc, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces").cast("long")).as("n_bpe_tokens"))
  }

  /** Learn `numMerges` BPE merges. Returns one row per learned merge:
    * `(merge_rank, left_sym, right_sym, pair_count)`, rank 1 = first.
    *
    * Ties on pair_count break on (left_sym, right_sym) ascending, so
    * the learned table is deterministic under any partitioning. The
    * driver loop is over VOCABULARY-sized frames only (the one corpus
    * pass happened in [[wordCounts]]); the per-iteration collect is a
    * single row — the argmax pair — which is the irreducible sequential
    * dependency of BPE (merge i+1's counts depend on merge i having
    * been applied). `localCheckpoint` truncates the growing rewrite
    * lineage each round, same pattern as [[Dedup.connectedComponents]].
    */
  def learnMerges(docs: DataFrame, textCol: String,
                  numMerges: Int, verbose: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    var vocab = wordCounts(docs, textCol)
      .select(initialSymbols("word").as("syms"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var done = false
    while (merges.length < numMerges && !done) {
      val t0 = System.nanoTime()
      val top = pairStats(vocab, "syms", "freq")
        .orderBy(desc("pair_count"), asc("left_sym"), asc("right_sym"))
        .limit(1).collect()
      if (top.isEmpty) done = true // every word is one symbol — nothing left
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((merges.length + 1, l, r, c))
        val next = vocab.select(
          applyMerge(col("syms"), l, r).as("syms"),
          col("freq")).localCheckpoint()
        Knn.releaseCheckpoint(vocab)
        vocab = next
        if (verbose) System.err.println(
          f"[bpe] merge ${merges.length}%2d ($l, $r) count=$c " +
            f"round=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    Knn.releaseCheckpoint(vocab)
    spark.createDataFrame(merges.toSeq)
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }
}
