package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality operators for training-data curation: token counting,
  * quality scoring, language ID, fingerprinting. Pure column expressions
  * (codegen'd, portable to the SQL oracle).
  */
object TextAnalysis {

  /** Whitespace token count (duplicates counted — raw length signal). */
  def tokenCount(text: Column): Column =
    size(TextFunctions.normalizedWords(text))

  /** BPE-ish subword count: word-count + one extra token per 4 chars of
    * long words — the standard cheap approximation of subword tokenizers
    * (a word of length L costs ~ceil(L/4) tokens).
    */
  def subwordCountApprox(text: Column): Column =
    aggregate(
      TextFunctions.normalizedWords(text),
      lit(0L),
      (acc, w) => acc + greatest(lit(1L), ceil(length(w) / 4.0).cast("long")))

  /** Quality heuristics: lengths, ratios of alphabetic/digit/punctuation
    * chars, mean word length, stopword ratio, distinct-token ratio. These
    * are the standard cheap filters (C4/Gopher-style) a corpus pipeline
    * applies before anything expensive.
    */
  def qualityStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = TextFunctions.normalizedWords(t)
    val nChars = length(t).cast("long")
    val nWords = size(words).cast("long")
    val alpha = nChars - length(regexp_replace(t, "[a-zA-Z]", ""))
    val digit = nChars - length(regexp_replace(t, "[0-9]", ""))
    val punct = nChars - length(regexp_replace(t, "[^a-zA-Z0-9\\s]", ""))
    val stop = size(filter(words,
      w => w.isin(StopwordsEn.map(lit): _*)))
    docs.select(
      col(idCol),
      nChars.as("n_chars"),
      nWords.as("n_words"),
      size(array_distinct(words)).cast("long").as("n_unique"),
      round(alpha.cast("double") / greatest(nChars, lit(1L)), 4).as("alpha_ratio"),
      round(digit.cast("double") / greatest(nChars, lit(1L)), 4).as("digit_ratio"),
      round(punct.cast("double") / greatest(nChars, lit(1L)), 4).as("punct_ratio"),
      round(stop.cast("double") / greatest(nWords, lit(1L)), 4).as("stopword_ratio"),
      round(size(array_distinct(words)).cast("double") /
        greatest(nWords, lit(1L)), 4).as("unique_ratio"))
  }

  /** Tiny per-language stopword lexicons for the n-gram/stopword language
    * heuristic. Deliberately small — language ID here is a cheap routing
    * signal, not a classifier.
    */
  val StopwordsEn = Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")
  val StopwordsFr = Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour")
  val StopwordsEs = Seq("el", "la", "los", "de", "y", "un", "una", "es", "que", "para")
  val StopwordsDe = Seq("der", "die", "das", "und", "ein", "eine", "ist", "nicht", "mit", "von")

  private val lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> StopwordsEn, "fr" -> StopwordsFr,
    "es" -> StopwordsEs, "de" -> StopwordsDe)

  /** Stopword-hit language scores + argmax language ("und" = undetermined
    * when nothing matches). Ties break lexicographically (deterministic).
    */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = TextFunctions.normalizedWords(col(textCol))
    val scored = docs.select(
      (col(idCol) +: lexicons.map { case (lang, lex) =>
        size(filter(words, w => w.isin(lex.map(lit): _*)))
          .cast("long").as(s"hits_$lang")
      }): _*)
    val best = lexicons.map { case (lang, _) => col(s"hits_$lang") }
      .reduce((a, b) => greatest(a, b))
    // first language in lexicographic order reaching the max score
    val langLex = lexicons.sortBy(_._1).foldRight(lit("und"): Column) {
      case ((lang, _), els) =>
        when(col(s"hits_$lang") === best && best > 0, lit(lang)).otherwise(els)
    }
    scored.withColumn("lang_pred", langLex)
  }

  /** Content-defined fingerprint row per doc: canonical text md5 plus the
    * order-sensitive rolling hash — the pair used for shift-tolerant
    * near-dup triage.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val canon = concat_ws(" ", TextFunctions.normalizedWords(col(textCol)))
    docs.select(
      col(idCol),
      md5(canon).as("canon_md5"),
      HashFunctions.rollingFingerprint(canon).as("rolling_fp"))
  }
}
