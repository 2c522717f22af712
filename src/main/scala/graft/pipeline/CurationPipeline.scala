package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.Dedup

/** End-to-end training-corpus curation: the standard cheap-to-expensive
  * cascade, composed from the engine's gated operators —
  *
  *   1. quality gate (length / alpha ratio / stopword ratio — C4-style)
  *   2. repetition gate (optional: Gopher-style duplicate-bigram
  *      fraction cap — `TextAnalysis.repetitionStats`)
  *   3. language gate (stopword-lexicon language ID)
  *   4. LM quality gate (optional: CCNet-style unigram log-prob vs a
  *      reference corpus — `TextAnalysis.unigramLogProb`)
  *   5. benchmark decontamination (optional: cross-corpus n-gram
  *      coverage vs a held-out eval set — `Decontaminate.ngramOverlap`)
  *   6. duplicated-span removal (optional: cut chunk-granularity spans
  *      shared across documents and reassemble — RefinedWeb's line-dedup
  *      slot, the one stage that REWRITES text; downstream dedups and
  *      the curated output see the cleaned text —
  *      `Chunking.dropDuplicatedChunks`)
  *   7. exact dedup (content-hash groupBy, keeper = min id)
  *   8. near-dedup (MinHash over 3-word shingles → LSH banding →
  *      exact n-gram Jaccard verification of candidates; drop the larger
  *      id of each verified pair)
  *
  * Everything stays one lazy DAG per stage; each stage's shuffle key is a
  * hash (content hash, band key, shingle), so the cascade scales the same
  * way the individual operators do. Stage predicates are exposed so
  * callers can re-balance the cascade (e.g. drop the language gate for a
  * multilingual corpus).
  */
object CurationPipeline {

  /** Granularity of the cascade's duplicated-span slot (`spanDedup`):
    * [[SpanChunks]] cuts fixed non-overlapping windows
    * ([[graft.operators.Chunking.dropDuplicatedChunks]]);
    * [[SpanSpans]] cuts ExactSubstr-grade spans at ARBITRARY
    * boundaries ([[graft.operators.Chunking.dropDuplicatedSpans]]) —
    * strictly stronger (a duplicated run straddling a chunk boundary
    * leaves both fixed windows non-hot, but stride-1 shingles catch it
    * wherever it starts) at the cost of stride-1 shingling work;
    * [[SpanLines]] cuts whole LINES shared across documents
    * ([[graft.operators.Chunking.dropDuplicatedLines]], CCNet's
    * paragraph-hash dedup) — the one mode that keeps surviving text
    * VERBATIM (no tokenize-and-reassemble normalization) and ignores
    * the slot's `width` (lines are the unit).
    */
  sealed trait SpanMode
  case object SpanChunks extends SpanMode
  case object SpanSpans extends SpanMode
  case object SpanLines extends SpanMode

  /** Per-stage survivor counts alongside the final corpus — the numbers a
    * pipeline report wants. `curated` is lazy (deliberately uncached —
    * caching the subtree disables AQE's runtime join planning across it,
    * measured ~2x slower); callers reusing it repeatedly can cache it
    * themselves. `counts` is also lazy: a caller that only consumes
    * `curated` never executes the cascade for the counts — touching
    * `counts` is what runs it (once; the result is memoized).
    *
    * RETENTION (stageCounts mode): `run(stageCounts = true)` leaves two
    * `localCheckpoint()` materializations alive — the gate/rewrite
    * boundary and the id-width keep set — because `curated` reads them;
    * releasing them eagerly would re-run the cascade under the caller's
    * action. Their blocks are reclaimed by the ContextCleaner once this
    * Result (and any plan derived from `curated`) becomes unreachable,
    * so a long-lived session calling stage-count runs in a loop should
    * drop each Result promptly rather than accumulate references.
    */
  final case class Result(curated: DataFrame,
                          private val countsFn: () => Map[String, Long]) {
    lazy val counts: Map[String, Long] = countsFn()
  }

  /** Streaming-ingestion form of the cascade's row-local stages: the
    * quality gate, the language gate, and watermarked exact dedup — all
    * the stages that work row-at-a-time (or with bounded keyed state) on
    * an unbounded stream. Metric columns are computed inline with the
    * SAME expressions the batch stages use (`TextAnalysis.qualityColumns`
    * / `langHitColumns`), so a row passes the stream gate iff it would
    * pass the batch gate. `nearDedupBits = Some(bits)` upgrades the
    * dedup state key from the content hash to the SimHash (collision =
    * same normalized token set — reorderings and boilerplate
    * re-renderings drop at ingest, strictly subsuming exact dedup).
    * `lshIndex = Some(bandedIndex)` additionally gates arrivals against
    * the ALREADY-LANDED corpus's banded MinHash table
    * ([[graft.operators.Dedup.indexBandKeys]] output) via the stateless
    * [[graft.operators.Dedup.streamingLshGate]] — stream-vs-stream LSH
    * still needs cross-corpus joins and remains a periodic batch
    * compaction, but stream-vs-index is just broadcast probes.
    *
    * Returns the surviving rows with the gate's scratch columns dropped;
    * `tsCol` must be the stream's event-time column (watermarked here —
    * don't watermark it again downstream).
    */
  def runStreaming(docs: DataFrame, idCol: String, textCol: String,
                   tsCol: String,
                   languages: Set[String] = Set("en"),
                   quality: Column = qualityGate(),
                   lateness: String = "1 hour",
                   nearDedupBits: Option[Int] = None,
                   clean: Boolean = false,
                   c4Rules: Boolean = false,
                   gopherGate: Boolean = false,
                   repeatSpanWidth: Option[Int] = None,
                   html: Boolean = false,
                   lshIndex: Option[DataFrame] = None,
                   lshK: Int = 8,
                   lshBands: Int = 4,
                   lshTokenize: Column => Column =
                     Dedup.shingleTokenizer(3)): DataFrame = {
    // markup extraction is a pure projection — streaming-legal in the
    // same pre-clean slot as the batch cascade
    val docs0 = if (!html) docs else docs.withColumn(textCol,
      graft.operators.Scrub.htmlToText(col(textCol)))
    // canonicalization is row-local, so the stream can run the same
    // zeroth stage as the batch cascade (the dedup state key then hashes
    // canonical bytes — whitespace re-renderings collide at ingest)
    val cleaned = if (!clean) docs0 else {
      graft.functions.GraftFunctions.register(docs.sparkSession)
      docs0.withColumn(textCol,
        graft.functions.GraftFunctions.cleanText(col(textCol)))
    }
    // C4 line rules are row-local and REWRITE text, so the stream runs
    // them in the same slot as the batch cascade (right after clean);
    // downstream gates and the dedup state key see the cleaned lines.
    // Same expressions as Scrub.c4Clean (c4LineKept / c4PageKeep).
    val afterC4 = if (!c4Rules) cleaned else {
      val raw = col(textCol)
      // __tc out of a single-row GENERATE, not a projection alias: the
      // page-keep filter would otherwise push below the projection with
      // the line-scan expression substituted into it, evaluating the
      // whole C4 line filter twice per row (and c4PageKeep's contract
      // requires a materialized attribute). A filter on a generator
      // output cannot push below the Generate; the array is never
      // null, so outer ≡ inner (the dropRepeatedSpans barrier pattern).
      cleaned
        .select(col("*"), explode_outer(array(
          array_join(filter(split(raw, "\n"),
            l => graft.operators.Scrub.c4LineKept(l,
              graft.operators.Scrub.C4MinLineWords,
              graft.operators.Scrub.C4LineDropToken)), "\n"))).as("__tc"))
        .filter(graft.operators.Scrub.c4PageKeep(raw, col("__tc"),
          minSentences = graft.operators.Scrub.C4MinSentences,
          pagePhrase = graft.operators.Scrub.C4PagePhrase))
        .withColumn(textCol, col("__tc"))
        .drop("__tc")
    }
    // one projection per stage (not a withColumn per metric — each
    // withColumn re-analyzes the whole growing plan), with the words
    // array materialized once per stage (HOF chains defeat codegen
    // subexpression elimination — see the qualityStats comment)
    val metrics = TextAnalysis.qualityColumnsOver(textCol, col("__ws"))
    val afterQuality0 = afterC4
      .withColumn("__ws",
        graft.functions.TextFunctions.normalizedWords(col(textCol)))
      .select(col("*") +: metrics.map { case (n, c) => c.as(n) }: _*)
      .filter(quality)
      .drop(metrics.map(_._1): _*).drop("__ws")
    // Gopher document rules (row-local): same predicates as the batch
    // readout — gopherRuleExprs is the single source for both
    val afterQuality =
      if (!gopherGate) afterQuality0
      else afterQuality0
        .withColumn("__ws",
          graft.functions.TextFunctions.normalizedWords(col(textCol)))
        .withColumn("__ls", TextAnalysis.gopherLines(col(textCol)))
        .filter(TextAnalysis
          .gopherRuleExprs(col(textCol), col("__ws"), col("__ls"))
          .map(_._2).reduce(_ && _))
        .drop("__ws", "__ls")
    val afterLang =
      if (languages.isEmpty) afterQuality
      else {
        val hits = TextAnalysis.langHitColumnsOver(col("__ws"))
        afterQuality
          .withColumn("__ws",
            graft.functions.TextFunctions.normalizedWords(col(textCol)))
          .select(col("*") +: hits.map { case (n, c) => c.as(n) }: _*)
          .withColumn("lang_pred", TextAnalysis.langPredFromHits)
          .filter(col("lang_pred").isin(languages.toSeq.map(lit): _*))
          .drop("lang_pred").drop(hits.map(_._1): _*).drop("__ws")
      }
    // within-doc repeated-span removal is row-local (zero shuffles, no
    // state) — the stream rewrites in the same POST-GATE slot as the
    // batch cascade (the rewrite normalizes text; gates must see the
    // original), so the dedup state key hashes the collapsed text on
    // both paths
    val afterRepeat = repeatSpanWidth match {
      case None => afterLang
      case Some(width) =>
        val keep = afterLang.columns.toSeq
          .filterNot(c => c == idCol || c == textCol)
        graft.operators.Chunking
          .dropRepeatedSpans(afterLang, idCol, textCol, width, carry = keep)
          .withColumnRenamed("clean_text", textCol)
          .drop("n_kept_tokens", "n_dropped_tokens", "n_repeat_starts")
    }
    // corpus-index LSH gate BEFORE the stateful self-dedup: stateless
    // broadcast probes, and every row it drops is a row the dedup never
    // has to hold state for
    val afterIndexGate = lshIndex match {
      case None => afterRepeat
      case Some(idx) =>
        Dedup.streamingLshGate(afterRepeat, textCol, idx, lshK, lshBands,
          lshTokenize)
    }
    // a SimHash dup strictly includes every exact dup, so the near
    // variant REPLACES the exact one — one stateful operator either way
    nearDedupBits match {
      case None =>
        Dedup.streamingExactDedup(afterIndexGate, textCol, tsCol, lateness)
          .drop("text_hash")
      case Some(bits) =>
        Dedup.streamingSimHashDedup(afterIndexGate, textCol, tsCol, bits,
          lateness)
          .drop("simhash")
    }
  }

  /** The landing-write stage of a web cascade — the production shape
    * the `crawl_chain` comment recorded (BASELINE.md round-12): markup
    * extraction (and optional canonicalization) happens ONCE, into the
    * landed corpus, so the cascade then runs `html = false` over
    * pre-extracted text. Inside `run(html = true)` the extraction
    * projection sits BELOW the cascade's several consumers of the slim
    * (id, text) frame and re-executes per consumer; extracting at the
    * landing write pays it exactly once (measured in ScaleBench
    * `crawl_chain_landed_10x` vs the r12 `crawl_chain_10x`).
    *
    * Non-text columns ride through unchanged. At cluster scale the
    * caller writes the result as the landed parquet table;
    * `materialize = true` stands in locally via `localCheckpoint`
    * (also what the multi-consumer cascade needs — an unmaterialized
    * fetch front end re-executes per consumer).
    */
  def landExtracted(docs: DataFrame, idCol: String, textCol: String,
                    clean: Boolean = false,
                    materialize: Boolean = true): DataFrame = {
    val extracted = docs.withColumn(textCol,
      graft.operators.Scrub.htmlToText(col(textCol)))
    val landed =
      if (!clean) extracted
      else {
        graft.functions.GraftFunctions.register(docs.sparkSession)
        extracted.withColumn(textCol,
          graft.functions.GraftFunctions.cleanText(col(textCol)))
      }
    if (materialize) landed.localCheckpoint() else landed
  }

  def qualityGate(minWords: Long = 5L, minAlphaRatio: Double = 0.5,
                  maxUniqueRatio: Double = 1.01): Column =
    col("n_words") >= minWords &&
      col("alpha_ratio") >= minAlphaRatio &&
      col("unique_ratio") <= maxUniqueRatio

  /** Run the cascade over docs(idCol, textCol). `languages` empty = skip
    * the language gate. `html = true` EXTRACTS text from markup before
    * anything else ([[graft.operators.Scrub.htmlToText]] — the step a
    * web-scrape corpus needs before any text gate can see words instead
    * of tags; the curated output carries the extracted text).
    * `clean = true` canonicalizes the text FIRST
    * (native NFC + control strip + whitespace collapse — the zeroth
    * stage of a web cascade; every downstream hash/gate then sees the
    * canonical bytes, and the curated output carries the cleaned text).
    * `repeatSpans = Some(width)` collapses within-doc repeated spans in
    * the rewrite slot (after all gates, before the dedups).
    * `spanDedup = Some((width, maxDf))` + `spanMode` select the
    * cross-doc span-removal stage and its granularity ([[SpanMode]]):
    * chunk windows, ExactSubstr arbitrary boundaries, or whole lines.
    * NOTE: the chunk/span modes NORMALIZE the curated text corpus-wide
    * (lowercased tokens, punctuation stripped, newlines joined) — the
    * tokenize-and-reassemble family; [[SpanLines]] keeps surviving
    * lines verbatim (and composes with `html = true`: extraction emits
    * one line per source block, line dedup then removes the blocks a
    * site template repeats).
    * `stageCounts` additionally reports survivor counts per stage —
    * via `observe()` metrics riding the cascade's own pass (ONE
    * CollectMetrics count per stage boundary, no per-stage caching or
    * counting jobs; probed round 15: Spark collects a named metric
    * once even when the observed subtree is duplicated by the
    * cascade's self-joins). Two boundaries materialize eagerly
    * (`localCheckpoint`): the gate/rewrite boundary — whose
    * materialization fires every prefix observation, and which the
    * dedup tail consumes 3× anyway — and the id-width keep set, so
    * the caller's action over `curated` re-runs NOTHING of the
    * cascade. (Observations do not survive a checkpoint, also probed:
    * every observe sits upstream of one of the two eager checkpoints
    * by construction.) Leave it off for a single fully-lazy DAG when
    * only the curated output matters.
    */
  def run(docs: DataFrame, idCol: String, textCol: String,
          languages: Set[String] = Set("en"),
          quality: Column = qualityGate(),
          minJaccard: Double = 0.8,
          benchmarks: Option[DataFrame] = None,
          contaminationN: Int = 3,
          maxContamination: Double = 0.5,
          maxDupBigramFrac: Option[Double] = None,
          lmReference: Option[DataFrame] = None,
          minAvgLogProb: Double = -12.0,
          spanDedup: Option[(Int, Long)] = None,
          spanMode: SpanMode = SpanChunks,
          clean: Boolean = false,
          c4Rules: Boolean = false,
          gopherGate: Boolean = false,
          repeatSpans: Option[Int] = None,
          stageCounts: Boolean = false,
          html: Boolean = false): Result = {
    // stage counts ride the plan as named CollectMetrics nodes — each
    // boundary contributes one `count` metric to the pass that
    // materializes it, instead of a cache + count job per stage
    val obsList = scala.collection.mutable.ListBuffer
      .empty[(String, org.apache.spark.sql.Observation)]
    def observed(df: DataFrame, key: String): DataFrame =
      if (!stageCounts) df
      else {
        val o = org.apache.spark.sql.Observation()
        obsList += ((key, o))
        df.observe(o, count(lit(1)).as("n"))
      }

    // Every stage works on the SLIM (id, text) projection and produces an
    // id set; the full-width corpus is joined back exactly once at the
    // end. This is both the 100-TB shape (the wide payload columns ride
    // through ZERO of the cascade's shuffles) and what lets Catalyst
    // de-duplicate the repeated subtrees: a frame reused by two
    // consumers only canonicalizes to one Exchange when both branches
    // prune to the SAME columns, which (id, text) everywhere guarantees.
    // (Caching the intermediates instead is the wrong tool — an
    // InMemoryRelation is a materialization barrier that blocks AQE's
    // runtime join planning, measured 2x slower.)
    // markup extraction precedes even canonicalization: tags and
    // entities must be gone before any gate counts words
    val docsText = if (!html) docs else docs.select(col(idCol),
      graft.operators.Scrub.htmlToText(col(textCol)).as(textCol))
    val slim0 = observed(
      if (!clean) docsText.select(col(idCol), col(textCol)) else {
        graft.functions.GraftFunctions.register(docs.sparkSession)
        docsText.select(col(idCol),
          graft.functions.GraftFunctions.cleanText(col(textCol)).as(textCol))
      }, "input")
    // optional C4 line rules (Raffel et al. §2.2): the other stage that
    // REWRITES text — RefinedWeb order puts line-level cleaning before
    // the quality gates, so everything downstream sees the kept lines
    val slim = if (!c4Rules) slim0 else observed(
      graft.operators.Scrub.c4Clean(slim0, idCol, textCol)
        .filter(col("keep"))
        .select(col(idCol), col("text_clean").as(textCol)), "after_c4")

    val q = TextAnalysis.qualityStats(slim, idCol, textCol)
      .filter(quality).select(col(idCol))
    val afterQuality0 = observed(slim.join(q, idCol), "after_quality")

    // optional Gopher document rules (Rae et al. A1.1): a second,
    // stricter quality family — same slim-id-set shape
    val afterQuality =
      if (!gopherGate) afterQuality0
      else observed(afterQuality0.join(
        TextAnalysis.gopherRules(afterQuality0, idCol, textCol)
          .filter(col("keep")).select(col(idCol)), idCol), "after_gopher")

    // optional repetition gate (Gopher-style): drop boilerplate whose
    // duplicate-bigram fraction crosses the cap. Same slim-id-set shape
    // as every other stage. Docs with fewer than two words have no
    // bigrams and drop here — they are degenerate under any repetition
    // policy and fail the default minWords quality gate anyway.
    val afterRepetition = maxDupBigramFrac match {
      case None => afterQuality
      case Some(cap) => observed(afterQuality.join(
        TextAnalysis.repetitionStats(afterQuality, idCol, textCol,
          ns = Seq(2))
          .filter(col("dup2gram_frac") <= cap)
          .select(col(idCol)), idCol), "after_repetition")
    }

    val afterLang = observed(
      if (languages.isEmpty) afterRepetition
      else afterRepetition.join(
        TextAnalysis.langId(afterRepetition, idCol, textCol)
          .filter(col("lang_pred").isin(languages.toSeq.map(lit): _*))
          .select(col(idCol)), idCol), "after_language")

    // optional LM gate (CCNet-style): drop docs whose add-one-smoothed
    // average unigram log-probability under the reference corpus falls
    // below the floor — "keep what reads like the reference". Same
    // slim-id-set shape as every other stage. A doc that normalizes to
    // zero tokens cannot be scored and drops here (it also fails the
    // default minWords quality gate upstream).
    val afterLm = lmReference match {
      case None => afterLang
      case Some(ref) => observed(afterLang.join(
        TextAnalysis.unigramLogProb(ref.select(col(textCol)), afterLang,
          idCol, textCol)
          .filter(col("avg_logprob") >= minAvgLogProb)
          .select(col(idCol)), idCol), "after_lm")
    }

    // benchmark decontamination: drop any doc whose n-gram coverage of a
    // held-out benchmark doc crosses the threshold (the benchmark side is
    // small, so its postings broadcast; see Decontaminate scaladoc)
    val afterDecon = benchmarks match {
      case None => afterLm
      case Some(bench) => observed(afterLm.join(
        graft.operators.Decontaminate
          .ngramOverlap(afterLm, bench.select(col(idCol), col(textCol)),
            idCol, textCol, n = contaminationN,
            minCoverage = maxContamination)
          .select(col(idCol)).distinct(),
        Seq(idCol), "left_anti"), "after_decontamination")
    }

    // optional WITHIN-doc repeated-span removal, in the REWRITE slot:
    // after every gate (the rewrite normalizes text — running it before
    // the gates would blind the line/punctuation-based rules), before
    // the document-level dedups, which then see the collapsed text.
    // localCheckpoint because the quadratic-per-row repeat scan is
    // row-local (no exchange to reuse) and three downstream consumers
    // would otherwise each re-run it over the corpus; the materialized
    // RDD also gives AQE exact sizes for the joins above it.
    // (the eager checkpoint here also fires every upstream observation
    // at its materialization — probed; the observe goes downstream of
    // it so the repeat count itself rides the NEXT boundary's pass)
    val afterRepeat = repeatSpans match {
      case None => afterDecon
      case Some(width) => observed(
        graft.operators.Chunking.dropRepeatedSpans(afterDecon, idCol,
          textCol, width)
          .filter(col("n_kept_tokens") > 0)
          .select(col(idCol), col("clean_text").as(textCol))
          .localCheckpoint(), "after_repeat_spans")
    }

    // optional duplicated-span removal (RefinedWeb order: span/line
    // dedup BEFORE the document-level dedups, which then see the
    // cleaned text). Rewrites text rather than gating ids: downstream
    // stages and the curated output consume `clean_text`; docs reduced
    // to nothing but boilerplate drop here. `spanMode` selects the
    // granularity: fixed chunks, or ExactSubstr arbitrary boundaries
    // (the only mode that removes a duplicate straddling a chunk edge).
    val afterSpanRaw = spanDedup match {
      case None => afterRepeat
      case Some((width, maxDf)) => observed(spanMode match {
        case SpanChunks =>
          graft.operators.Chunking.dropDuplicatedChunks(afterRepeat,
            idCol, textCol, width, maxDf)
            .filter(col("n_kept_chunks") > 0)
            .select(col(idCol), col("clean_text").as(textCol))
        case SpanSpans =>
          graft.operators.Chunking.dropDuplicatedSpans(afterRepeat,
            idCol, textCol, width, maxDf)
            .filter(col("n_kept_tokens") > 0)
            .select(col(idCol), col("clean_text").as(textCol))
        case SpanLines =>
          graft.operators.Chunking.dropDuplicatedLines(afterRepeat,
            idCol, textCol, maxDf)
            .filter(col("n_kept_lines") > 0)
            .select(col(idCol), col("clean_text").as(textCol))
      }, "after_span_dedup")
    }
    // the gate/rewrite boundary: the dedup tail consumes it 3× (exact
    // groups, signatures, verification arrays) and the curated join
    // once more. In stage-count mode it materializes eagerly — the ONE
    // corpus-sized pass, which also fires every observation above —
    // and everything downstream reads the checkpoint. In the lazy mode
    // the repeated subtrees stay in one DAG (Catalyst canonicalizes the
    // shared (id, text) prunings to one Exchange).
    val afterSpan =
      if (stageCounts) afterSpanRaw.localCheckpoint() else afterSpanRaw

    // the exact-dedup keeper ids double as the near-dedup stage's input
    // universe: the final keep set is keepersExact minus near-dup losers,
    // so the cascade's tail never needs a third pass over the corpus.
    // (keeper count == afterExact count: ids are unique, the join below
    // only restores text — so the exact-dedup observation rides here.)
    val keepersExact = observed(
      Dedup.exactGroups(afterSpan, idCol, textCol)
        .select(col("keeper_id").as(idCol)), "after_exact_dedup")
    val afterExact = afterSpan.join(keepersExact, idCol)

    // near-dedup: LSH candidates verified by exact shingle Jaccard; the
    // verification join is only over candidate ids, never all pairs
    val sigs = Dedup.minHashSignatures(afterExact, idCol, textCol,
      k = 8, tokenize = Dedup.shingleTokenizer(3))
    // candidates feeds BOTH candIds and the verification semi-join.
    // Deliberately NOT cached (see above) — both consumers read the
    // banding aggregation's exchange.
    val candidates = Dedup.lshCandidates(sigs, idCol, k = 8, bands = 4)
    // both endpoints via one generator pass (a unionAll of two selects
    // would evaluate the banding pipeline twice)
    val candIds = candidates
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct()
    val verified = Dedup.ngramJaccardPairs(
      afterExact.join(candIds, idCol), idCol, textCol,
      n = 3, blockCol = lit(1), minJaccard = minJaccard)
    val losers = verified
      .join(candidates, Seq("id_a", "id_b"), "left_semi")
      .select(col("id_b").as(idCol)).distinct()
    val keepIds0 = keepersExact.join(losers, Seq(idCol), "left_anti")
    // stage-count mode: the id-width keep set materializes eagerly (the
    // tail's one pass, firing the exact-dedup observation), so the
    // caller's action over `curated` re-runs nothing of the cascade
    val keepIds =
      if (stageCounts) keepIds0.localCheckpoint() else keepIds0
    // with a text-rewriting stage on (canonicalization and/or span
    // dedup), the curated corpus carries the REWRITTEN text (textCol
    // moves to the end of the schema); otherwise the original row rides
    // through untouched
    val curated =
      if (!html && !clean && !c4Rules && repeatSpans.isEmpty &&
          spanDedup.isEmpty)
        docs.join(keepIds, Seq(idCol))
      else docs.drop(textCol)
        .join(afterSpan.select(col(idCol), col(textCol)), Seq(idCol))
        .join(keepIds, Seq(idCol))

    if (stageCounts) {
      // both checkpoints above have materialized: every observation is
      // fulfilled, and the near count is a count over id-width
      // checkpointed rows
      val m = Map("after_near_dedup" -> keepIds.count()) ++
        obsList.map { case (k, o) => k -> o.get("n").asInstanceOf[Long] }
      Result(curated, () => m)
    } else {
      // single lazy DAG: nothing executes until the caller acts on
      // `curated` or reads `counts`
      Result(curated, () => Map("after_near_dedup" -> keepIds0.count()))
    }
  }
}
