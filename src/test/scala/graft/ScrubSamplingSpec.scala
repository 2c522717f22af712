package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Chunking, Dedup, Sampling, Scrub}

/** Blocklist screening, regex redaction, temperature mixing, and the
  * near-dup keeper corpus.
  */
class ScrubSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("blocklistStats counts occurrences and distinct terms, flags keep") {
    val docs = Seq(
      (1L, "the slow slow dup query"),   // 3 blocked occurrences, 2 terms
      (2L, "Clean text entirely"),       // none
      (3L, "DUP dup! dup, slow")         // normalization folds case/punct
    ).toDF("doc_id", "text")
    val out = Scrub.blocklistStats(docs, "doc_id", "text",
      terms = Seq("slow", "dup"), maxBlocked = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out(0) == ((1L, 3L, 2L, false)))
    assert(out(1) == ((2L, 0L, 0L, true)))
    assert(out(2) == ((3L, 4L, 2L, false)))
  }

  test("redact applies PII rules in order and counts per-rule matches") {
    val df = Seq(
      (1L, "mail a.user+x@site.org or call +1 (555) 123-4567 room 9"),
      (2L, "no pii at all")
    ).toDF("id", "s")
    val out = Scrub.redact(df, "s", Scrub.PiiRules).orderBy("id")
      .as[(Long, String, String, Long, Long, Long)].collect()
    // email first, then the phone, then the bare digit run; each later
    // rule sees earlier rules' output so placeholder text is never re-hit
    assert(out(0)._3 == "mail <EMAIL> or call <PHONE> room <NUM>")
    assert((out(0)._4, out(0)._5, out(0)._6) == ((1L, 1L, 1L)))
    assert(out(1)._3 == "no pii at all")
    assert((out(1)._4, out(1)._5, out(1)._6) == ((0L, 0L, 0L)))
  }

  test("htmlToText strips markup, decodes entities once, keeps block " +
    "separation; malformed markup degrades deterministically") {
    def x(html: String): String = Seq(html).toDF("h")
      .select(Scrub.htmlToText(col("h"))).head().getString(0)
    // script bodies vanish even when they CONTAIN markup-looking
    // strings (lazy match runs to the real closer)
    assert(x("""<p>keep</p><script>if (a<b) { w("<p>no</p>"); }</script>""")
      == "keep")
    // script and style are separate passes — a script closed by
    // </style> cannot cross-match and swallow the text between blocks
    assert(x("<style>p{}</style>mid<script>var a;</script>end")
      == "mid end")
    // entities decode exactly once: &amp;lt; means the four characters
    // "&lt;" and must NOT double-decode into "<"
    assert(x("<p>&amp;lt; &lt; &gt; &quot; &#39; &nbsp;&amp;</p>")
      == "&lt; < > \" ' &")
    // block closers become REAL newlines (one line per source block —
    // what the C4 line rules and the line dedup consume); inline tags
    // leave a space so markup can never FUSE two tokens into one
    assert(x("<p>a</p><p>b</p><div>c<b>d</b></div>") == "a\nb\nc d")
    // comments vanish whole, even when their body contains '>' — the
    // generic strip alone would bite at the first '>' and leave
    // phantom text behind
    assert(x("a<!-- hidden > still hidden -->b") == "a b")
    // a commented-out block loses its inner script first, then its
    // comment shell
    assert(x("<p>x</p><!-- <script>var a;</script> -->y") == "x\ny")
    // unterminated script: text survives minus its tags (documented
    // degradation, not an exception)
    assert(x("<p>before</p><script>var a = 1;") == "before\nvar a = 1;")
    // whitespace runs WITHOUT a newline collapse to one space; runs
    // WITH a newline collapse to one newline (line structure survives)
    assert(x("<p>a \t b</p>") == "a b")
    assert(x("<p>a\n\n\tb</p>") == "a\nb")
    // <br> is boundary-anchored: bare, self-closed, and attributed
    // forms break lines, but a tag whose name merely STARTS with 'br'
    // is an ordinary inline tag (a phantom newline here would change
    // line-dedup granularity)
    assert(x("a<br>b<br/>c<br />d<br class=\"x\">e") == "a\nb\nc\nd\ne")
    assert(x("a<broken>b</broken>c<br-widget>d") == "a b c d")
  }

  test("html metadata: title, meta orders, canonical, lang, noindex") {
    def m(h: String): (String, String, String, String, Boolean) = {
      val r = Seq(h).toDF("h").select(
        Scrub.htmlTitle(col("h")), Scrub.htmlMetaContent(col("h"),
          "description"), Scrub.htmlCanonical(col("h")),
        Scrub.htmlLang(col("h")), Scrub.htmlNoindex(col("h"))).head()
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getBoolean(4))
    }
    // entity decode + whitespace collapse in the title; BOTH meta
    // attribute orders; canonical in reverse attribute order too
    assert(m("""<html lang="EN"><title> A &amp;  B </title>""" +
      """<meta content="d1" name="description">""" +
      """<link href="http://c.com/x" rel="canonical"></html>""")
      == (("A & B", "d1", "http://c.com/x", "en", false)))
    assert(m("""<meta name="description" content="d2">""")
      == (("", "d2", "", "", false)))
    // noindex needs a token boundary: 'noindexing' is not noindex —
    // but a newline-wrapped attribute value still counts
    assert(m("""<meta name="robots" content="noindex, nofollow">""")._5)
    assert(m("""<meta name="robots" content="noindexing">""")._5 == false)
    assert(m("""<meta name="robots" content="nofollow,noindex">""")._5)
    assert(m("<meta name=\"robots\" content=\"nofollow,\nnoindex\">")._5)
    assert(m("plain text, no markup") == (("", "", "", "", false)))
    // an explicit EMPTY content="" is the page's answer — it must not
    // fall through to a later reversed-order tag
    assert(m("""<meta name="description" content="">""" +
      """<meta content="spam" name="description">""")._2 == "")
    // data-* attributes are not the attributes they suffix
    assert(m("""<html data-lang="xx"><meta data-name="robots" """ +
      """content="noindex">""") == (("", "", "", "", false)))
    // og:-style namespaced names work (and dots stay literal)
    assert(Seq("""<meta name="og:title" content="t1">""").toDF("h")
      .select(Scrub.htmlMetaContent(col("h"), "og:title")).head()
      .getString(0) == "t1")
    assert(Seq("""<meta name="aXb" content="w">""").toDF("h")
      .select(Scrub.htmlMetaContent(col("h"), "a.b")).head()
      .getString(0) == "")
  }

  test("c4Clean applies each published line and page rule") {
    val docs = Seq(
      // clean page: three proper sentences survive, page kept
      (1L, "this page has five good words.\n" +
        "and another proper long sentence!\n" +
        "a third one asks a question?"),
      // line rules: no terminal punct / too few words / drop token —
      // every line dies, page dies on the sentence minimum
      (2L, "no terminal punctuation on this line\n" +
        "too few words.\n" +
        "enable javascript to view this content."),
      // page rules fire regardless of good lines
      (3L, "lorem ipsum dolor sit amet text here.\n" +
        "perfectly fine second sentence here.\n" +
        "perfectly fine third sentence here."),
      (4L, "a curly { bracket kills the whole page.\n" +
        "perfectly fine second sentence here.\n" +
        "perfectly fine third sentence here."),
      // two surviving sentences < minSentences=3: verdicts true-ish but
      // keep=false
      (5L, "only two sentences survive this page.\n" +
        "and here is the second one of them.")
    ).toDF("doc_id", "text")
    val out = Scrub.c4Clean(docs, "doc_id", "text").orderBy("doc_id")
      .select("doc_id", "text_clean", "n_lines", "n_kept_lines",
        "has_page_phrase", "has_brace", "n_sentences", "keep")
      .as[(Long, String, Long, Long, Boolean, Boolean, Long, Boolean)]
      .collect()
    assert(out(0) == ((1L,
      "this page has five good words.\n" +
        "and another proper long sentence!\n" +
        "a third one asks a question?", 3L, 3L, false, false, 3L, true)))
    assert(out(1) == ((2L, "", 3L, 0L, false, false, 0L, false)))
    assert(out(2)._5 && !out(2)._8 && out(2)._4 == 3L) // phrase kills page
    assert(out(3)._6 && !out(3)._8)                    // brace kills page
    assert(out(4) == ((5L,
      "only two sentences survive this page.\n" +
        "and here is the second one of them.", 2L, 2L, false, false, 2L,
      false)))
  }

  test("c4Clean honors custom thresholds and drop tokens") {
    val docs = Seq(
      (1L, "short line ok.\nthis one mentions The Token so it dies."))
      .toDF("doc_id", "text")
    val out = Scrub.c4Clean(docs, "doc_id", "text", minLineWords = 3,
      minSentences = 1, lineDropToken = "the token")
      .select("text_clean", "n_kept_lines", "keep")
      .as[(String, Long, Boolean)].collect().head
    assert(out == (("short line ok.", 1L, true)))
  }

  test("temperatureMix keeps the largest source at keepLargest and boosts small ones") {
    // sources sized 400/100/25: sqrt rebalance at keepLargest=0.5 gives
    // cutoffs 0.5, 1.0, 1.0 → small sources keep everything
    val docs = (0 until 400).map(i => (i.toLong, "big")) ++
      (400 until 500).map(i => (i.toLong, "mid")) ++
      (500 until 525).map(i => (i.toLong, "tiny"))
    val df = docs.toDF("doc_id", "source")
    val kept = Sampling.temperatureMix(df, "doc_id", "source",
      keepLargest = 0.5)
    val bySource = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource("mid") == 100L && bySource("tiny") == 25L)
    // the hash decision is uniform-ish; 0.5 cutoff on 400 keys lands
    // well inside (100, 300) with overwhelming margin
    assert(bySource("big") > 100L && bySource("big") < 300L)
    // determinism: same inputs → identical kept set
    val again = Sampling.temperatureMix(df, "doc_id", "source",
      keepLargest = 0.5)
    assert(kept.select("doc_id").except(again.select("doc_id")).isEmpty &&
      again.select("doc_id").except(kept.select("doc_id")).isEmpty)
  }

  test("nearDupKeepers keeps singletons and cluster minima only") {
    val docs = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (7L, "z"), (9L, "e")
    ).toDF("doc_id", "text")
    // clusters {1,2,3} and {4,9}; 7 is in no cluster and survives
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 9L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(edges, "id_a", "id_b")
    val kept = Dedup.nearDupKeepers(docs, "doc_id", comps)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 7L))
  }

  test("bestKeepers picks the quality argmax; null quality never wins") {
    val docs = Seq(
      // cluster {1,2,3}: 1 has NULL quality, 3 the highest → keeper 3
      (1L, null.asInstanceOf[java.lang.Double]),
      (2L, java.lang.Double.valueOf(5.0)),
      (3L, java.lang.Double.valueOf(9.0)),
      // cluster {4,5}: tie → lower id 4
      (4L, java.lang.Double.valueOf(7.0)),
      (5L, java.lang.Double.valueOf(7.0)),
      // cluster {6,7}: ALL null → degenerate to min-id 6
      (6L, null.asInstanceOf[java.lang.Double]),
      (7L, null.asInstanceOf[java.lang.Double]),
      // 8 unclustered (null quality) → passes through untouched
      (8L, null.asInstanceOf[java.lang.Double])
    ).toDF("doc_id", "q")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (6L, 7L))
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(edges, "id_a", "id_b")
    val kept = Dedup.bestKeepers(docs, "doc_id", comps, col("q"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 4L, 6L, 8L))
    // constant quality degenerates to nearDupKeepers' min-id rule
    val const = Dedup.bestKeepers(docs, "doc_id", comps, lit(1.0))
      .select("doc_id").as[Long].collect().sorted
    assert(const.toSeq == Seq(1L, 4L, 6L, 8L))
  }

  test("tokenChunks windows overlap by stride and the tail reaches the end") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5"),  // 5 tokens, w=2 s=2 → [2,2,1]
      (2L, "x"),               // shorter than width → one short window
      (3L, "")                 // no alnum → dropped entirely
    ).toDF("doc_id", "text")
    val flat = Chunking.tokenChunks(docs, "doc_id", "text",
      width = 2, stride = 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, String)].collect()
    assert(flat.map(c => (c._1, c._2, c._3)).toSeq ==
      Seq((1L, 0L, 2L), (1L, 1L, 2L), (1L, 2L, 1L), (2L, 0L, 1L)))
    // 50% overlap: starts move by stride while windows keep full width
    val lap = Chunking.tokenChunks(docs.filter($"doc_id" === 1L),
      "doc_id", "text", width = 4, stride = 2)
      .orderBy("chunk_idx").as[(Long, Long, Long, String)].collect()
    assert(lap.map(_._3).toSeq == Seq(4L, 3L)) // [t1..t4], [t3..t5]
  }

  test("dropDuplicatedChunks cuts cross-doc spans and reassembles in order") {
    // "aa bb" is shared by docs 1,2,3 (df=3 > maxDf=2) → cut everywhere;
    // each doc's unique spans survive in position order
    val docs = Seq(
      (1L, "aa bb u1 v1"),
      (2L, "aa bb u2 v2"),
      (3L, "u3 v3 aa bb"),
      (4L, "aa bb"),          // entirely boilerplate → empty survivor
      (5L, "w1 w2 w3")        // untouched
    ).toDF("doc_id", "text")
    val out = Chunking.dropDuplicatedChunks(docs, "doc_id", "text",
      width = 2, maxDf = 2L)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "u1 v1", 1L, 1L),
      (2L, "u2 v2", 1L, 1L),
      (3L, "u3 v3", 1L, 1L),
      (4L, "", 0L, 1L),
      (5L, "w1 w2 w3", 2L, 0L)))
    // within-doc repetition alone does not cross the DISTINCT-doc df cap
    val solo = Chunking.dropDuplicatedChunks(
      Seq((9L, "r1 r2 r1 r2 r1 r2")).toDF("doc_id", "text"),
      "doc_id", "text", width = 2, maxDf = 2L)
      .as[(Long, String, Long, Long)].head()
    assert(solo == ((9L, "r1 r2 r1 r2 r1 r2", 3L, 0L)))
  }

  test("dropDuplicatedLines cuts corpus-hot lines verbatim, keeps order") {
    // "menu" appears in 3 docs (df=3 > maxDf=2) → dropped from ALL of
    // them, first copies included; case-variant and whitespace-variant
    // lines are DIFFERENT lines (verbatim semantics — no tokenizer)
    val docs = Seq(
      (1L, "menu\nunique one\nmenu"),
      (2L, "menu\nunique two"),
      (3L, "unique three\nmenu"),
      (4L, "Menu\nmenu \nunique four"), // variants survive (df=1 each)
      (5L, "menu")                      // pure boilerplate → empty
    ).toDF("doc_id", "text")
    val out = Chunking.dropDuplicatedLines(docs, "doc_id", "text",
      maxDf = 2L).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "unique one", 1L, 2L),
      (2L, "unique two", 1L, 1L),
      (3L, "unique three", 1L, 1L),
      (4L, "Menu\nmenu \nunique four", 3L, 0L),
      (5L, "", 0L, 1L)))
    // within-doc repetition alone does not cross the DISTINCT-doc cap
    val solo = Chunking.dropDuplicatedLines(
      Seq((9L, "r\nr\nr")).toDF("doc_id", "text"), "doc_id", "text",
      maxDf = 2L).as[(Long, String, Long, Long)].head()
    assert(solo == ((9L, "r\nr\nr", 3L, 0L)))
  }

  test("dropDuplicatedSpans removes boundary-straddling runs chunks miss") {
    // X1..X4 is shared by docs 1 and 2 but STRADDLES both docs'
    // fixed-window boundaries — the exact case chunk-granularity
    // removal cannot see
    val docs = Seq(
      (1L, "a1 a2 a3 X1 X2 X3 X4 a4 a5"),
      (2L, "b1 X1 X2 X3 X4 b2 b3 b4")
    ).toDF("doc_id", "text")
    val chunked = Chunking.dropDuplicatedChunks(docs, "doc_id", "text",
      width = 4, maxDf = 1L).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    // chunk windows never align on the run → q96-style removal is blind
    assert(chunked.forall(_._4 == 0L),
      s"fixed windows should miss the straddling run: $chunked")
    val spans = Chunking.dropDuplicatedSpans(docs, "doc_id", "text",
      width = 4, maxDf = 1L).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(spans == Seq(
      (1L, "a1 a2 a3 a4 a5", 5L, 4L),
      (2L, "b1 b2 b3 b4", 4L, 4L)))
  }

  test("dropDuplicatedSpans merges overlapping hot shingles into one span") {
    // a shared 6-token run yields three overlapping hot 4-shingles;
    // coverage is their union — one maximal removed span, not three cuts
    val docs = Seq(
      (1L, "c1 Y1 Y2 Y3 Y4 Y5 Y6 c2"),
      (2L, "Y1 Y2 Y3 Y4 Y5 Y6 d1 d2"),
      (3L, "e1 e2 e3 e4 e5"), // no duplication → untouched
      (4L, "f1 f2")           // shorter than width → no shingles
    ).toDF("doc_id", "text")
    val out = Chunking.dropDuplicatedSpans(docs, "doc_id", "text",
      width = 4, maxDf = 1L).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "c1 c2", 2L, 6L),
      (2L, "d1 d2", 2L, 6L),
      (3L, "e1 e2 e3 e4 e5", 5L, 0L),
      (4L, "f1 f2", 2L, 0L)))
  }

  test("dropRepeatedSpans keeps first occurrences, merges repeat runs") {
    val docs = Seq(
      // "x1 x2" repeats at positions 5-6: first occurrence (1-2) stays
      (1L, "a0 x1 x2 b0 c0 x1 x2 d0"),
      // immediate repetition "r1 r2 r1 r2 r1 r2": positions 2..5 are
      // covered by repeat starts {2, 4} (and 3 for the wrap pair
      // "r2 r1") → one maximal span, only the first "r1 r2" survives
      (2L, "r1 r2 r1 r2 r1 r2"),
      (3L, "u1 u2 u3 u4"),   // no repeats → untouched
      (4L, "solo")           // shorter than width → untouched
    ).toDF("doc_id", "text")
    val out = Chunking.dropRepeatedSpans(docs, "doc_id", "text", width = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "a0 x1 x2 b0 c0 d0", 6L, 2L, 1L),
      (2L, "r1 r2", 2L, 4L, 3L),
      (3L, "u1 u2 u3 u4", 4L, 0L, 0L),
      (4L, "solo", 1L, 0L, 0L)))
  }

  test("tokenBudgetSelect keeps the greedy whole-doc prefix within budget") {
    import graft.functions.TextAnalysis
    val docs = Seq(
      (1L, "aaaaa bbbbb ccccc"), // n_chars 17, 3 tokens
      (2L, "aa bb cc dd"),       // n_chars 11, 4 tokens — boundary group
      (3L, "abc def ghi"),       // n_chars 11, 3 tokens — boundary group
      (4L, "a b")                // n_chars 3,  2 tokens
    ).toDF("doc_id", "text")
    def kept(budget: Long): Seq[Long] =
      TextAnalysis.tokenBudgetSelect(docs, "doc_id", "text", budget,
        metric = "n_chars")
        .select("doc_id").as[Long].collect().sorted.toSeq
    // greedy order by (n_chars DESC, id): d1(3) d2(4) d3(3) d4(2).
    // budget 7 fills d1+d2 exactly; d3 (same quality, higher id) and
    // the cheaper d4 are NOT knapsacked in — greedy prefix semantics
    assert(kept(7L) == Seq(1L, 2L))
    assert(kept(100L) == Seq(1L, 2L, 3L, 4L)) // everything fits
    assert(kept(2L) == Seq())                 // first doc overflows
    assert(kept(11L) == Seq(1L, 2L, 3L))      // d4 (cum 12) just misses
    assert(kept(12L) == Seq(1L, 2L, 3L, 4L))  // exact fit keeps all
  }

  test("tokenChunks covers every token for any (length, width, stride)") {
    for (l <- Seq(1, 2, 5, 7, 16, 33); w <- Seq(1, 2, 4, 8); s <- Seq(1, 2, 4)
         if s <= w) {
      val text = (1 to l).map(i => s"t$i").mkString(" ")
      val chunks = Chunking.tokenChunks(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", w, s)
        .orderBy("chunk_idx")
        .as[(Long, Long, Long, String)].collect()
      val expectedN = math.max(1, math.ceil((l - w).toDouble / s).toInt + 1)
      assert(chunks.length == expectedN, s"l=$l w=$w s=$s")
      // every window has the tokens its (start, width) slice implies, so
      // together they cover the whole document and the tail reaches l
      chunks.foreach { case (_, idx, n, _) =>
        val start = idx * s
        assert(n == math.min(w, l - start), s"l=$l w=$w s=$s idx=$idx")
      }
      val covered = chunks.flatMap { case (_, idx, n, _) =>
        (idx * s) until (idx * s + n) }.toSet
      assert(covered == (0 until l).toSet, s"l=$l w=$w s=$s coverage")
    }
  }

  test("scriptProfile counts codepoint ranges and picks the dominant script") {
    val docs = Seq(
      (1L, "hello мир"),        // latin 5, cyrillic 3 → latin
      (2L, "ab гд"),            // 2-2 tie → latin (earlier precedence)
      (3L, "один два три ok"),  // cyrillic 10 > latin 2
      (4L, "你好 한글 नमस्ते"),   // cjk 2, hangul 2, devanagari 6
      (5L, "12345 !?"),         // no script chars at all → none
      (6L, "")                  // empty: none, ratio 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scriptProfile(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_chars", "n_latin", "n_cyrillic", "n_cjk",
        "n_hangul", "n_devanagari", "dominant_script", "dominant_ratio")
      .as[(Long, Long, Long, Long, Long, Long, Long, String, Double)]
      .collect().toSeq
    assert(out(0) == ((1L, 9L, 5L, 3L, 0L, 0L, 0L, "latin", 5.0 / 9)))
    assert(out(1) == ((2L, 5L, 2L, 2L, 0L, 0L, 0L, "latin", 2.0 / 5)))
    assert(out(2)._8 == "cyrillic" && out(2)._4 == 10L)
    // devanagari नमस्ते is 6 codepoints (4 consonant/vowel letters + 2
    // combining signs — all inside the 0900-097F block)
    assert(out(3)._5 == 2L && out(3)._6 == 2L && out(3)._7 == 6L &&
      out(3)._8 == "devanagari")
    assert(out(4)._8 == "none" && out(4)._9 == 0.0)
    assert(out(5) == ((6L, 0L, 0L, 0L, 0L, 0L, 0L, "none", 0.0)))
  }

  test("qualityPercentileGate keeps docs at or above the corpus quantile") {
    val docs = Seq(
      (1L, "abcd"), // alpha_ratio 1.0
      (2L, "ab12"), // 0.5
      (3L, "abc1"), // 0.75
      (4L, "1234")  // 0.0
    ).toDF("doc_id", "text")
    // sorted ratios [0, .5, .75, 1]; p25 interpolates to 0.375
    val kept = TextAnalysis.qualityPercentileGate(docs, "doc_id", "text",
      metric = "alpha_ratio", q = 0.25)
      .orderBy("doc_id")
      .as[(Long, Double, Double)].collect()
    assert(kept.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(kept.forall(_._3 == 0.375))
  }

  test("Aho–Corasick multi-match counts overlaps and follows suffix links") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    def counts(text: String, terms: Seq[String]): Seq[Long] =
      Seq(text).toDF("t")
        .select(GraftFunctions.multiMatch(org.apache.spark.sql.functions
          .col("t"), terms))
        .head().getSeq[Long](0)
    // the classic: 'ushers' ends he, she, hers via suffix links
    assert(counts("ushers", Seq("he", "she", "his", "hers"))
      == Seq(1L, 1L, 0L, 1L))
    // overlapping occurrences all count
    assert(counts("aaa", Seq("aa")) == Seq(2L))
    // nested terms at the same end position: 'ar' in spARk and pARt,
    // 'art' inside pART, 'park' inside sPARK, 'a' three times
    assert(counts("spark and part", Seq("ar", "art", "park", "a"))
      == Seq(2L, 1L, 1L, 3L))
    // phrases (with spaces) match across word boundaries
    assert(counts("a fast sorter", Seq("fast sort", "sorter"))
      == Seq(1L, 1L))
  }

  test("substring blocklist gates on one automaton walk per doc") {
    val docs = Seq(
      (1L, "clean text with nothing flagged"),
      (2L, "the park art and spark"),
      (3L, null: String))
      .toDF("doc_id", "text")
    val out = graft.operators.Scrub.substringBlocklistStats(
      docs, "doc_id", "text", Seq("park", "art"), maxHits = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // hand-count: 'park' twice (the word + inside sPARK), 'art' once
    // (the word) → 3 hits over 2 distinct terms, gated out at maxHits=2
    assert(out(1L) == (0L, 0L, true), s"got $out")
    assert(out(2L)._1 == 3L && out(2L)._2 == 2L && !out(2L)._3,
      s"got $out")
    assert(!out.contains(3L), "null text rows drop")
  }

  test("substring redaction masks merged overlapping spans, keeps casing") {
    def redact(text: String, terms: Seq[String]): (String, Long) = {
      val r = graft.operators.Scrub.redactSubstrings(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", terms)
        .head()
      (r.getString(1), r.getLong(2))
    }
    // she (1..3) and hers (3..6) overlap at 'h'/'e' — union masks 1..6
    assert(redact("ushers", Seq("she", "hers")) == ("u*****", 5L))
    // overlapping occurrences of ONE term merge into a single run
    assert(redact("aaa", Seq("aa")) == ("***", 3L))
    // the walk is case-insensitive, the splice preserves unmatched
    // ORIGINAL casing
    assert(redact("Spark and PART", Seq("park", "art"))
      == ("S**** and P***", 7L))
    // no match → text rides through untouched
    assert(redact("Clean Words", Seq("zz")) == ("Clean Words", 0L))
  }

  test("redaction n_masked counts rewritten positions, not source masks") {
    def redact(text: String, terms: Seq[String]): (String, Long) = {
      val r = graft.operators.Scrub.redactSubstrings(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", terms)
        .head()
      (r.getString(1), r.getLong(2))
    }
    // a literal '*' in the source is NOT masked work: the text keeps
    // it, and the count covers only the blocklist-rewritten positions
    assert(redact("a * b she", Seq("she")) == ("a * b ***", 3L))
    // an uncovered source mask amid real matches still counts 0
    assert(redact("**aa**", Seq("aa")) == ("******", 2L))
    // a covered position that ALREADY held the mask is a no-op rewrite
    // (terms are matched on the lowered source, so 'a*c' can match)
    assert(redact("xa*cx", Seq("a*c")) == ("x***x", 2L))
  }

  test("redaction falls back to lowered text when lower() changes length") {
    // U+0130 (İ) lowercases to TWO chars (i + U+0307): the positional
    // case-splice would misalign, so the row keeps the redacted
    // LOWERCASE text — coverage stays exact, casing is sacrificed
    val r = graft.operators.Scrub.redactSubstrings(
      Seq((1L, "İ She ROCKS")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("she"))
      .head()
    assert(r.getString(1) == "i̇ *** rocks")
    assert(r.getLong(2) == 3L)
    // ...and a same-length non-ASCII lowering still splices casing
    val ok = graft.operators.Scrub.redactSubstrings(
      Seq((1L, "ÜBER She")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("she"))
      .head()
    assert(ok.getString(1) == "ÜBER ***")
    assert(ok.getLong(2) == 3L)
  }
}
