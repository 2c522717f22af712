package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text operators (pure built-in Catalyst expressions — every
  * function here stays inside whole-stage codegen; no UDFs).
  *
  * Semantics mirror the reference tokenizer
  * (`DocumentSimilarityMapper.java:80-89`): lowercase, replace anything
  * outside `[a-z0-9\s]` with a space, split on `\s+`, drop empties, dedup
  * keeping first-seen order.
  */
object TextFunctions {

  /** Normalized (non-deduped) token array.
    * Reference: `DocumentSimilarityMapper.java:82-87` minus the Set.
    */
  def normalizedWords(text: Column): Column =
    filter(
      split(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+"),
      (t: Column) => t =!= ""
    )

  /** P2 — unique normalized tokens, first-seen order preserved
    * (`array_distinct` keeps first occurrence, matching `LinkedHashSet`).
    * Reference: `DocumentSimilarityMapper.java:80-89`.
    */
  def normalizeTokens(text: Column): Column =
    array_distinct(normalizedWords(text))

  /** Whitespace token count (non-set semantics — counts duplicates). */
  def wordCount(text: Column): Column =
    size(normalizedWords(text))

  /** Character n-gram shingles of the normalized text (for near-dup
    * detection). Joins normalized tokens with single spaces first so
    * shingles are whitespace-canonical, then slides a window of `n` chars.
    */
  def charShingles(text: Column, n: Int): Column = {
    val canon = concat_ws(" ", normalizedWords(text))
    val idx = sequence(lit(1), greatest(lit(1), length(canon) - lit(n - 1)))
    array_distinct(transform(idx, (i: Column) => substring(canon, i, lit(n))))
  }

  /** Word n-gram shingles (set) of the normalized token stream. */
  def wordShingles(text: Column, n: Int): Column = {
    val words = normalizedWords(text)
    val idx = sequence(lit(1), greatest(lit(1), size(words) - lit(n - 1)))
    array_distinct(
      transform(idx, (i: Column) => concat_ws(" ", slice(words, i, lit(n)))))
  }
}
