package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** SentencePiece-style unigram-LM tokenization (Kudo 2018, "Subword
  * Regularization" §3; the `--model_type=unigram` default of the
  * SentencePiece library) — the probabilistic sibling of [[Bpe]]: a
  * piece VOCABULARY with log-probabilities, segmentation = the
  * Viterbi-best split of each word, training = EM over the corpus with
  * vocabulary pruning.
  *
  * Engine shape (the same discipline as [[Bpe.learnMerges]]):
  *
  *   - segmentation is PER DISTINCT WORD: the corpus collapses to a
  *     `(word, freq)` vocabulary once, the Viterbi DP (a native
  *     codegen kernel, `UnigramSegExpr`) runs once per word — never
  *     once per occurrence — and documents re-meet the result through
  *     a token-keyed equi-join (`Bpe.bpeTokenCounts`'s shape);
  *   - the MODEL (piece table) is driver-sized and rides into the scan
  *     as a literal (broadcast at cluster scale): per-row work is one
  *     hash-probing DP over the word's characters, no join;
  *   - each EM iteration is ONE distributed pass: segment the word
  *     vocabulary, count freq-weighted piece occurrences (map-side
  *     combined, key space = the piece vocabulary), collect the
  *     model-sized count table, re-normalize on the driver.
  *
  * Viterbi ties break (fewer pieces, then longer final piece at each
  * DP cell) — the struct-max order the q168 SQL oracle replays, so
  * segmentations are bit-reproducible across engines.
  *
  * Reference behavior: jaccard-mapreduce has no tokenizer; this is
  * part of the demanded training-data-pipeline extension surface.
  */
object Unigram {

  /** Viterbi-segment the corpus's DISTINCT words under a literal piece
    * table: `(word, freq, pieces, n_pieces, logprob)`; `logprob` is
    * the winning path's summed piece log-probability (the DP score,
    * accumulated in piece order). Words no piece path covers are
    * DROPPED — with single-character pieces for the corpus alphabet in
    * the table (any trained table keeps them) nothing drops.
    */
  def segmentWords(docs: DataFrame, textCol: String,
                   pieceTable: Seq[(String, Double)]): DataFrame =
    segmentWordTable(Bpe.wordCounts(docs, textCol), pieceTable)

  /** [[segmentWords]] over an ALREADY-BUILT `(word, freq)` table — the
    * form the EM loop uses so iterations re-segment the checkpointed
    * vocabulary instead of re-scanning and re-tokenizing the corpus.
    */
  def segmentWordTable(wordCounts: DataFrame,
                       pieceTable: Seq[(String, Double)]): DataFrame = {
    require(pieceTable.nonEmpty, "segmentWords: empty piece table")
    GraftFunctions.register(wordCounts.sparkSession)
    val (pieces, lps) = pieceTable.unzip
    val lpMap = typedlit(pieceTable.toMap)
    wordCounts
      // single-row generator barrier: the null filter must read a
      // materialized attribute, not re-evaluate the DP kernel (the
      // lshGate / q23 scan-filter discipline)
      .select(col("word"), col("freq"),
        explode_outer(array(
          GraftFunctions.unigramSegment(col("word"), pieces, lps)))
          .as("pieces"))
      .filter(col("pieces").isNotNull)
      .select(col("word"), col("freq"), col("pieces"),
        size(col("pieces")).as("n_pieces"),
        // left fold in piece order — the DP accumulates its score in
        // exactly this order, so the replayed sum is bit-identical
        aggregate(transform(col("pieces"), p => element_at(lpMap, p)),
          lit(0.0), (acc, x) => acc + x).as("logprob"))
  }

  /** Freq-weighted piece-occurrence counts of the corpus under a piece
    * table — the E-step readout (hard/Viterbi EM): one segmentation
    * pass, one aggregation whose key space is the piece vocabulary.
    */
  def pieceCounts(docs: DataFrame, textCol: String,
                  pieceTable: Seq[(String, Double)]): DataFrame =
    pieceCountsOf(Bpe.wordCounts(docs, textCol), pieceTable)

  private def pieceCountsOf(wordCounts: DataFrame,
                            pieceTable: Seq[(String, Double)]): DataFrame =
    segmentWordTable(wordCounts, pieceTable)
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("freq")).as("n"))

  /** Train a unigram piece table by Viterbi EM with pruning:
    *
    *   1. SEED: every corpus character, plus the `seedCandidates` most
    *      frequent substrings of length 2..`maxPieceLen` (freq-weighted
    *      occurrence counts; ties to the lexicographically smaller
    *      substring) — log-probs from relative counts;
    *   2. EM ROUND: segment under the current table, re-estimate
    *      `lp(piece) = ln(count / total)`; multi-char pieces that won
    *      ZERO occurrences are dropped (their probability mass is
    *      unrecoverable under hard EM), single chars always survive
    *      (full coverage — the SentencePiece invariant);
    *   3. PRUNE (after the last round): keep all single chars and the
    *      highest-count multi-char pieces up to `vocabSize`.
    *
    * Each round is one distributed pass + one model-sized collect.
    * Returns the table sorted by piece (deterministic).
    */
  def learnUnigram(docs: DataFrame, textCol: String, vocabSize: Int,
                   iters: Int = 2, maxPieceLen: Int = 4,
                   seedCandidates: Int = 64): Seq[(String, Double)] = {
    require(vocabSize >= 1 && iters >= 1 && maxPieceLen >= 2,
      s"learnUnigram: vocabSize=$vocabSize iters=$iters " +
        s"maxPieceLen=$maxPieceLen")
    GraftFunctions.register(docs.sparkSession)
    val wc = Bpe.wordCounts(docs, textCol).localCheckpoint()
    // substring candidates, freq-weighted: every (start, len) window of
    // every distinct word, counted once per corpus occurrence. The
    // top-K selection runs DISTRIBUTED — only alphabet-sized and
    // seedCandidates-sized results ever reach the driver (a full
    // distinct-substring collect would be corpus-vocabulary-sized)
    val subs = wc
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("__i"))
      .select(col("word"), col("freq"), col("__i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("__i") + 1)))
          .as("__l"))
      .select(col("word").substr(col("__i"), col("__l")).as("piece"),
        col("freq"))
      .groupBy(col("piece"))
      .agg(sum(col("freq")).as("n"))
    val charRows = subs.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val total0 = charRows.map(_._2).sum.toDouble
    val chars = charRows.map { case (p, n) => p -> math.log(n / total0) }
    val multi = subs.filter(length(col("piece")) > 1)
      .orderBy(col("n").desc, col("piece"))
      .limit(seedCandidates)
      .collect()
      .map(r => r.getString(0) -> math.log(r.getLong(1) / total0))
    var table = (chars ++ multi).sortBy(_._1).toSeq
    for (_ <- 1 to iters) {
      val counts = pieceCountsOf(wc, table)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // coverage floor: an unused single char stays representable at
      // half a count — INSIDE the normalizer, so exp(lp) still sums
      // to 1 over the surviving table (a proper distribution)
      val floorChars = table.count { case (p, _) =>
        p.length == 1 && counts.getOrElse(p, 0L) == 0L }
      val total = counts.values.sum.toDouble + 0.5 * floorChars
      table = table.flatMap { case (p, _) =>
        val n = counts.getOrElse(p, 0L)
        if (n > 0L) Some(p -> math.log(n / total))
        else if (p.length == 1) Some(p -> math.log(0.5 / total))
        else None
      }.sortBy(_._1)
    }
    val keepChars = table.filter(_._1.length == 1)
    val keepMulti = table.filter(_._1.length > 1)
      .sortBy { case (p, lp) => (-lp, p) }
      .take(math.max(0, vocabSize - keepChars.size))
    (keepChars ++ keepMulti).sortBy(_._1)
  }

  /** Per-document token counts under a unigram table — the tokenizer-
    * budget readout ([[Bpe.bpeTokenCounts]]'s shape: per-distinct-word
    * DP, token-keyed join back, map-side combined re-aggregation).
    * Output: `(id, n_words, n_unigram_tokens)`.
    */
  def unigramTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                         pieceTable: Seq[(String, Double)]): DataFrame = {
    val enc = segmentWords(docs, textCol, pieceTable)
      .select(col("word"), col("n_pieces"))
    docs
      .filter(col(idCol).isNotNull &&
        lower(col(textCol)).rlike("[a-z0-9]"))
      .select(col(idCol),
        graft.functions.TextFunctions.normalizedWords(col(textCol))
          .as("__ws"))
      .select(col(idCol), explode_outer(col("__ws")).as("word"))
      .join(enc, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).cast("long").as("n_unigram_tokens"))
  }
}
