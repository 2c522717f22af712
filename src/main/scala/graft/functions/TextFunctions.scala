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
  /** n-gram windows over an element array, via a zip-with chain against
    * offset slices of the same array.
    *
    * WHY this shape: the obvious
    * `transform(sequence(...), i => slice(elems, i, n))` puts `elems` in
    * the LAMBDA BODY, and higher-order functions re-evaluate lambda-body
    * subtrees per element — if `elems` is a tokenizer chain (regex, split)
    * that turns an O(len) projection into O(len²) per row (measured 15 s
    * for 5 k docs). In the zip-with chain every occurrence of `elems` is
    * an argument position, evaluated once per row; the lambdas touch only
    * their own elements.
    *
    * zip_with pads the shorter (offset) side with null and `combine` is
    * expected to ignore nulls (concat_ws does), so the trailing short
    * windows exist but are sliced off: exactly `max(1, len-n+1)` windows,
    * the final one possibly shorter than n when len < n; empty input gives
    * an empty result.
    */
  private def windowed(elems: Column, n: Int,
                       combine: (Column, Column) => Column): Column = {
    val joined = (2 to n).foldLeft(elems) { (acc, o) =>
      val shifted = slice(elems, lit(o),
        greatest(size(elems) - lit(o - 1), lit(0)))
      zip_with(acc, shifted, combine)
    }
    array_distinct(slice(joined, lit(1),
      when(size(elems) === 0, lit(0))
        .otherwise(greatest(lit(1), size(elems) - lit(n - 1)))))
  }

  /** Character n-gram shingles of the whitespace-canonicalized normalized
    * text (for near-dup detection). Uses the native one-pass kernel
    * (`CharNGramsExpr`) — requires `GraftFunctions.register` on the
    * session; the chained-HOF composition it replaces
    * (`charShinglesComposed`, kept for the equivalence spec) runs n
    * interpreted zip_with passes over the char array per row.
    */
  def charShingles(text: Column, n: Int): Column =
    GraftFunctions.charNGrams(concat_ws(" ", normalizedWords(text)), n)

  /** The pure-builtin composition `charShingles` is bit-equivalent to
    * (spec-pinned); session-independent but interpreted.
    */
  private[graft] def charShinglesComposed(text: Column, n: Int): Column = {
    val canon = concat_ws(" ", normalizedWords(text))
    // split(c, "") keeps a trailing "" (Java split semantics) — drop it
    val chars = filter(split(canon, ""), (c: Column) => c =!= "")
    windowed(chars, n, (a, b) => concat_ws("", a, b))
  }

  /** Word n-gram shingles (set) of the normalized token stream. For hot
    * paths, pre-materialize the words array in its own projection and call
    * `wordShinglesOf` on the attribute.
    */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesOf(normalizedWords(text), n)

  /** Word n-gram shingles over an already-computed words array column. */
  def wordShinglesOf(words: Column, n: Int): Column =
    windowed(words, n, (a, b) => concat_ws(" ", a, b))

  /** Word n-grams as a MULTISET (duplicates kept, occurrence counts
    * preserved) over an already-computed words array attribute — exactly
    * `max(0, len - n + 1)` full-width grams, none when `len < n`. The
    * repetition statistics (`TextAnalysis.repetitionStats`) need counts,
    * so neither `windowed`'s `array_distinct` nor its short trailing
    * window apply here. Same zip-with chain as `windowed` (see the WHY
    * above): `words` must be a materialized attribute, never an inline
    * tokenizer chain.
    */
  def wordNgramsAllOf(words: Column, n: Int): Column = {
    val joined = (2 to n).foldLeft(words) { (acc, o) =>
      val shifted = slice(words, lit(o),
        greatest(size(words) - lit(o - 1), lit(0)))
      zip_with(acc, shifted, (a, b) => concat_ws(" ", a, b))
    }
    slice(joined, lit(1), greatest(size(words) - lit(n - 1), lit(0)))
  }
}
