package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Content scrubbing for corpus curation: blocklist screening (the
  * C4-style "bad word" gate) and regex redaction (PII-shaped rewrites).
  *
  * Both are narrow per-row projections — the blocklist and the redaction
  * rules are driver-side literals folded into the expression tree, so at
  * 100 TB these run map-side inside whole-stage codegen with zero
  * shuffles, zero joins, and zero broadcast variables. That is the right
  * shape for screening: the corpus streams through once and every
  * decision is a pure function of the row.
  */
object Scrub {

  /** Per-document blocklist statistics: total blocked-token occurrences,
    * distinct blocked terms hit, and the keep decision
    * (`n_blocked <= maxBlocked`). Terms are matched against the
    * reference-normalized token stream (lowercase, alnum-only), so the
    * caller's blocklist should be lowercase words.
    *
    * The words array is materialized in its own projection and the
    * counts read that attribute — the tokenizer chain never reaches a
    * filter, so nothing expensive is pushed into the scan (the q23
    * scan-filter trap; the only scan-adjacent predicate is the cheap
    * id null check).
    */
  def blocklistStats(docs: DataFrame, idCol: String, textCol: String,
                     terms: Seq[String], maxBlocked: Long = 0): DataFrame = {
    require(terms.nonEmpty, "empty blocklist")
    val termsArr = array(terms.map(lit): _*)
    docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol),
        TextFunctions.normalizedWords(col(textCol)).as("__ws"))
      .select(col(idCol),
        size(filter(col("__ws"),
          w => array_contains(termsArr, w))).cast("long")
          .as("n_blocked"),
        size(array_intersect(array_distinct(col("__ws")), termsArr))
          .cast("long").as("n_blocked_distinct"))
      .withColumn("keep", col("n_blocked") <= maxBlocked)
  }

  /** SUBSTRING screening at scale — what the word-level
    * [[blocklistStats]] cannot see: phrases ("fast sort"), terms glued
    * inside longer tokens, obfuscations. ONE Aho–Corasick automaton
    * walk per document (native `MultiMatchExpr`; the pattern list is a
    * literal reference object, K patterns cost one text scan instead
    * of K contains/regex passes — the shape a 100 TB screening pass
    * needs). Counts include overlapping occurrences. `terms` must
    * already be lowercase (the text is lowercased before the walk).
    * Output: `(idCol, n_hits, n_terms_hit, keep)`.
    */
  def substringBlocklistStats(docs: DataFrame, idCol: String,
                              textCol: String, terms: Seq[String],
                              maxHits: Long = 0): DataFrame = {
    require(terms.nonEmpty, "empty blocklist")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      // generator barrier: the aggregations below read the counts
      // array attribute, not a re-run automaton walk per reference
      .select(col(idCol), explode_outer(array(
        graft.functions.GraftFunctions
          .multiMatch(lower(col(textCol)), terms))).as("__c"))
      .select(col(idCol),
        aggregate(col("__c"), lit(0L), (a, x) => a + x).as("n_hits"),
        size(filter(col("__c"), c => c > lit(0L))).cast("long")
          .as("n_terms_hit"))
      .withColumn("keep", col("n_hits") <= maxHits)
  }

  /** Substring REDACTION — the rewrite stage [[substringBlocklistStats]]
    * gates: every character covered by any (overlapping, nested)
    * occurrence of a blocklist term becomes `mask`, in one automaton
    * walk per document. Case-preserving on unmatched text; the walk
    * runs over the lowercased text so coverage is case-insensitive,
    * and the mask applies to the ORIGINAL characters positionally.
    * Output: `(idCol, clean_text, n_masked)`.
    *
    * `n_masked` counts REWRITTEN positions — redacted char is the mask
    * AND the lowercased source char was not — so mask characters
    * already present in the source are never counted as masked (a
    * covered source char that already equals the mask is a no-op
    * rewrite and counts 0).
    *
    * The case-preserving splice zips original against lowered text by
    * position, which assumes `lower` is length-preserving — true for
    * ASCII and almost all of the BMP but not universally (e.g. U+0130
    * lowercases to two chars). Rows where lowering changes the length
    * fall back to the redacted lowercase text (coverage stays exact;
    * casing is lost for that row only). `n_masked` never needs the
    * guard: it compares the redacted text against the lowered source,
    * which are the same string through the automaton — always aligned.
    *
    * `mask` must not be a character some OTHER character lowercases
    * into: the splice keys on `redacted == mask`, so with e.g.
    * `mask = 'x'` an UNCOVERED source 'X' lowers to 'x' == mask and
    * the splice would silently emit the mask, losing the original
    * casing. Enforced: the mask must be a non-letter with no case
    * mappings of its own (rules out 'ß'-style letters whose 1:1
    * toUpper is themselves, and cased non-letters like circled
    * alphanumerics). The default `'*'` qualifies.
    */
  def redactSubstrings(docs: DataFrame, idCol: String, textCol: String,
                       terms: Seq[String], mask: Char = '*'): DataFrame = {
    require(terms.nonEmpty, "empty blocklist")
    require(!mask.isLetter && mask.toLower == mask && mask.toUpper == mask,
      s"mask '$mask' must be an uncased non-letter: the case-preserving " +
        "splice keys on char equality with the mask, so a mask some " +
        "source char lowercases into would silently drop that char's " +
        "original casing")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // redact the LOWERCASED text, then splice unmasked ORIGINAL chars
    // back by position: zip_with over the two char arrays keeps the
    // source casing everywhere the automaton left text alone
    val m = mask.toString
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), col(textCol).as("__t"),
        explode_outer(array(graft.functions.GraftFunctions
          .multiRedact(lower(col(textCol)), terms, mask))).as("__r"))
      .select(col(idCol),
        when(length(lower(col("__t"))) === length(col("__t")),
          concat_ws("", zip_with(split(col("__t"), ""),
            split(col("__r"), ""),
            (o, r) => when(r === m, lit(m)).otherwise(o))))
          .otherwise(col("__r")).as("clean_text"),
        aggregate(
          zip_with(split(lower(col("__t")), ""), split(col("__r"), ""),
            (o, r) => when(r === m && o =!= m, lit(1L)).otherwise(lit(0L))),
          lit(0L), (a, x) => a + x).as("n_masked"))
  }

  /** Published C4 rule defaults (Raffel et al. 2020 §2.2) — the single
    * source for [[c4Clean]]'s signature and the streaming gate in
    * `CurationPipeline.runStreaming`, so batch/stream parity can never
    * drift on a literal.
    */
  val C4MinLineWords: Int = 5
  val C4MinSentences: Int = 3
  val C4LineDropToken: String = "javascript"
  val C4PagePhrase: String = "lorem ipsum"

  /** C4 line-level cleaning (Raffel et al. 2020, "Exploring the Limits of
    * Transfer Learning with a Unified Text-to-Text Transformer", §2.2):
    * the published heuristics that turned Common Crawl into C4. Lines are
    * retained only when they end in a terminal punctuation mark
    * (`.` `!` `?` or a closing quote), contain at least `minLineWords`
    * words, and do not mention `lineDropToken` (the paper drops any line
    * with the word "javascript"); pages are dropped entirely when they
    * contain `pagePhrase` ("lorem ipsum"), a curly bracket, or fewer than
    * `minSentences` sentences after line filtering. The paper's remaining
    * rules are separate operators here: the bad-word gate is
    * [[blocklistStats]] and the three-sentence-span dedup is
    * `Chunking.dropDuplicatedChunks`.
    *
    * Returns one row per input document: `text_clean` (the kept lines
    * re-joined with newlines), line/sentence counts, one verdict column
    * per page rule so downstream can audit WHICH gate fired (the q114
    * convention), and the composite `keep`.
    *
    * Scale shape: a narrow per-row projection — every rule is a pure
    * function of the row, folded into one whole-stage-codegen projection
    * with zero shuffles, zero joins. The corpus streams through once;
    * at 100 TB this is scan-bound. No filter is applied here (verdicts
    * are returned, not enforced), so no computed expression can be
    * duplicated into the scan as a pushed filter.
    */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
              minLineWords: Int = C4MinLineWords,
              minSentences: Int = C4MinSentences,
              lineDropToken: String = C4LineDropToken,
              pagePhrase: String = C4PagePhrase): DataFrame = {
    require(minLineWords >= 1, s"minLineWords must be >= 1: $minLineWords")
    require(minSentences >= 0, s"minSentences must be >= 0: $minSentences")
    require(lineDropToken.nonEmpty && pagePhrase.nonEmpty,
      "empty rule token/phrase")
    def lineKept(l: Column): Column = c4LineKept(l, minLineWords, lineDropToken)
    docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol), col(textCol),
        split(col(textCol), "\n").as("__lines"))
      .select(col(idCol),
        array_join(filter(col("__lines"), lineKept(_)), "\n")
          .as("text_clean"),
        size(col("__lines")).cast("long").as("n_lines"),
        size(filter(col("__lines"), lineKept(_))).cast("long")
          .as("n_kept_lines"),
        lower(col(textCol)).contains(pagePhrase.toLowerCase)
          .as("has_page_phrase"),
        (col(textCol).contains("{") || col(textCol).contains("}"))
          .as("has_brace"))
      // sentence count is measured on the SURVIVING lines (a dropped
      // line's punctuation shouldn't rescue a page), by terminal-mark
      // occurrences — the cheap portable proxy for sentence splitting
      .withColumn("n_sentences",
        length(regexp_replace(col("text_clean"), "[^.!?]", ""))
          .cast("long"))
      .withColumn("keep",
        !col("has_page_phrase") && !col("has_brace") &&
          col("n_sentences") >= minSentences)
  }

  /** A line survives C4 when it ends in terminal punctuation, carries
    * enough words, and never mentions the drop token (case-insensitive)
    * — the single source both [[c4Clean]] and the streaming gate in
    * `CurationPipeline.runStreaming` evaluate.
    */
  private[graft] def c4LineKept(l: Column, minLineWords: Int,
                                lineDropToken: String): Column =
    rtrim(l).rlike("[.!?\"']$") &&
      size(filter(split(trim(l), "[ \t]+"), w => w =!= "")) >=
        minLineWords &&
      !lower(l).contains(lineDropToken.toLowerCase)

  /** The C4 page verdict over (raw text, already-cleaned text) — shared
    * by [[c4Clean]]'s column form and the streaming gate. `textClean`
    * must be a MATERIALIZED attribute (the sentence count re-reads it).
    */
  private[graft] def c4PageKeep(t: Column, textClean: Column,
                                minSentences: Int,
                                pagePhrase: String): Column =
    !lower(t).contains(pagePhrase.toLowerCase) &&
      !(t.contains("{") || t.contains("}")) &&
      length(regexp_replace(textClean, "[^.!?]", "")).cast("long") >=
        minSentences

  /** Ordered redaction rules: each `(pattern, replacement)` is applied in
    * sequence (later rules see earlier rules' output, exactly like a
    * chain of `regexp_replace` calls — the oracle states the same
    * nesting). Patterns must be portable across Java regex and RE2:
    * character classes, `+`/`*`/`{m,n}` quantifiers, and alternation
    * only — no backreferences, no lookaround.
    */
  val PiiRules: Seq[(String, String)] = Seq(
    ("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("\\+?[0-9][0-9() -]{6,}[0-9]", "<PHONE>"),
    ("[0-9]+", "<NUM>"))

  /** Apply `rules` to `textCol`, returning the input columns plus
    * `<textCol>_redacted` and one `n_<i>` match count per rule. Counts
    * are measured on each rule's INPUT text via split cardinality
    * (`size(split(s, pattern)) - 1` — both Java and RE2 splits keep
    * trailing empty fields, so the count is engine-portable).
    */
  /** HTML → text extraction — the step a web-scrape pipeline runs
    * BEFORE any of the text operators in this library (a 100 TB corpus
    * starts as markup): drop script/style subtrees and comments, turn
    * the block-closing tags into newlines, strip the remaining tags,
    * decode the six ubiquitous entities, collapse whitespace. One
    * whole-stage-codegen projection of chained `regexp_replace` — no
    * shuffle, scan-bound, streaming-legal.
    *
    * Block boundaries SURVIVE as real newlines: whitespace runs that
    * contain a line break collapse to `\n`, all other runs to a single
    * space. Line-oriented downstream stages (the C4 line rules, the
    * cross-document line dedup) therefore see one line per source
    * block instead of one line per document. (Note `cleanText`
    * collapses ALL whitespace to spaces — in the cascade, run `html`
    * with `c4Rules` and without `clean`, or accept that the line gates
    * see the whole document as one line.)
    *
    * Every pattern is deliberately RE2-compatible (lazy quantifiers
    * and inline flags only — no backreferences or lookarounds) and
    * whitespace classes are spelled out explicitly, so a DuckDB oracle
    * replays the chain verbatim (Java `\s` vs RE2 `\s` differ on
    * vertical tab — the q99 lesson). Script and style subtrees are
    * removed in SEPARATE passes so `<script>…</style>` can never
    * cross-match; comments are removed AFTER them so a legacy
    * `<script><!-- … --></script>` wrapper goes with its script and a
    * commented-out `<!-- <script>…</script> -->` loses its inner block
    * first and then its comment shell. Unterminated script/style
    * blocks keep their text (the lazy match needs a closer) and then
    * lose their TAGS to the generic strip — a documented,
    * deterministic degradation on malformed markup, not an error path.
    */
  def htmlToText(html: Column): Column = {
    val hws = "[ \\t\\x0B\\f\\r]" // horizontal whitespace (no \n)
    var c = html
    c = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    c = regexp_replace(c, "(?is)<style[^>]*>.*?</style>", " ")
    // comments AFTER script/style, BEFORE the generic strip: the
    // generic <[^>]+> would otherwise bite `<!-- a > b -->` at the
    // first `>` and leave ` b -->` behind as phantom text
    c = regexp_replace(c, "(?s)<!--.*?-->", " ")
    // block-level closers and <br> become line breaks so words from
    // different blocks never fuse and line structure survives; the br
    // tag name is boundary-anchored (bare / self-closed / attributed)
    // so <broken>-style tags don't inject phantom newlines
    c = regexp_replace(c,
      "(?i)<br(?:/?|\\s[^>]*)>|</p>|</div>|</li>|</tr>|</h[1-6]>", "\n")
    c = regexp_replace(c, "<[^>]+>", " ")
    c = decodeEntities(c, Seq("&nbsp;" -> " ", "&#39;" -> "'"))
    // whitespace runs WITH a newline → one newline; the rest → one
    // space; then strip spaces AND newlines off both ends (regex, not
    // the two-arg trim — that signature is deprecated in Spark 4)
    c = regexp_replace(c, s"$hws*\\n[ \\t\\n\\x0B\\f\\r]*", "\n")
    c = regexp_replace(c, s"$hws+", " ")
    regexp_replace(c, "^[ \\n]+|[ \\n]+$", "")
  }

  /** `<title>` text, entity-decoded and whitespace-collapsed — the
    * strongest single curation signal a page carries besides its body.
    * '' when absent.
    */
  def htmlTitle(html: Column): Column =
    trim(regexp_replace(decodeEntities(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1),
      Seq("&nbsp;" -> " ", "&#39;" -> "'")),
      "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** Content of `<meta name="…" content="…">` (case-insensitive name,
    * either attribute order), entity-decoded; '' when absent. `name`
    * is a literal attribute value (letters, digits, `.:_-` — colons
    * included for the og:/twitter: namespaces), regex-quoted before
    * interpolation. Attribute names are whitespace-anchored so
    * `data-name=`/`data-content=` never match, and order dispatch
    * tests the PATTERN (not the captured value), so an explicit empty
    * `content=""` stays empty instead of falling through to a later
    * reversed-order tag.
    */
  def htmlMetaContent(html: Column, name: String): Column = {
    require(name.matches("[A-Za-z0-9.:_-]+"), s"not a meta name: $name")
    val q = java.util.regex.Pattern.quote(name)
    val fwdPat =
      s"""(?is)<meta(?:\\s[^>]*)?\\sname="$q"[^>]*\\scontent="([^"]*)""""
    val revPat =
      s"""(?is)<meta(?:\\s[^>]*)?\\scontent="([^"]*)"[^>]*\\sname="$q""""
    decodeEntities(
      when(html.rlike(fwdPat), regexp_extract(html, fwdPat, 1))
        .otherwise(regexp_extract(html, revPat, 1)),
      Seq("&nbsp;" -> " ", "&#39;" -> "'"))
  }

  /** The `<link rel="canonical">` target — the page's OWN statement of
    * its canonical URL, which a crawl dedup trusts above any
    * normalization heuristic when present. '' when absent.
    */
  def htmlCanonical(html: Column): Column = {
    val fwdPat =
      "(?is)<link(?:\\s[^>]*)?\\srel=\"canonical\"[^>]*\\shref=\"([^\"]*)\""
    val revPat =
      "(?is)<link(?:\\s[^>]*)?\\shref=\"([^\"]*)\"[^>]*\\srel=\"canonical\""
    when(html.rlike(fwdPat), regexp_extract(html, fwdPat, 1))
      .otherwise(regexp_extract(html, revPat, 1))
  }

  /** The `lang` attribute of the `<html>` tag, lowercased ('' when
    * absent) — the author's own language claim, checked against
    * langid/scriptProfile rather than trusted blindly.
    */
  def htmlLang(html: Column): Column =
    lower(regexp_extract(html,
      "(?is)<html(?:\\s[^>]*)?\\slang=\"([^\"]*)\"", 1))

  /** True when a robots meta tag declares `noindex` — pages that ask
    * to stay out of indexes generally also don't belong in a training
    * corpus.
    */
  def htmlNoindex(html: Column): Column =
    htmlMetaContent(html, "robots")
      .rlike("(?i)(^|[, \\t\\n\\x0B\\f\\r])noindex" +
        "($|[, \\t\\n\\x0B\\f\\r])")

  /** Single-pass markup-entity decode shared by [[htmlToText]] and
    * [[graft.operators.Urls.extractSitemapLocs]]: the base
    * `&lt;/&gt;/&quot;` trio, then each caller's `extra` entities,
    * then — LAST, and only here — `&amp;`: decoding it earlier would
    * turn `&amp;lt;` into `&lt;` and a later pass would double-decode.
    * One owner for that ordering invariant.
    */
  private[graft] def decodeEntities(c0: Column,
                                    extra: Seq[(String, String)]): Column = {
    var c = c0
    c = regexp_replace(c, "&lt;", "<")
    c = regexp_replace(c, "&gt;", ">")
    c = regexp_replace(c, "&quot;", "\"")
    extra.foreach { case (e, r) => c = regexp_replace(c, e, r) }
    regexp_replace(c, "&amp;", "&")
  }

  def redact(df: DataFrame, textCol: String,
             rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "no redaction rules")
    val (redacted, counts) = rules.zipWithIndex
      .foldLeft((col(textCol), Seq.empty[Column])) {
        case ((cur, acc), ((pat, rep), i)) =>
          val n = (size(split(cur, pat)) - 1).cast("long").as(s"n_$i")
          (regexp_replace(cur, pat, rep), acc :+ n)
      }
    df.select(
      (df.columns.map(col).toSeq :+
        redacted.as(s"${textCol}_redacted")) ++ counts: _*)
  }
}
