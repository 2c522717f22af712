package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Context-length chunking: split each document's token stream into
  * fixed-width windows with a configurable stride — the step that turns
  * curated documents into model-context-sized pieces (training windows,
  * RAG passages). Complements [[Packing]]: packing concatenates SHORT
  * documents up to a budget; chunking splits LONG documents down to one.
  *
  * Shape: one tokenizer pass, then windows are array slices over the
  * materialized token attribute — per-row compute, no shuffle, no join;
  * the output order is (id, chunk_idx) derived, so downstream writers
  * stay deterministic. At 100 TB this is a pure map stage: rows out ≈
  * rows in × avg(len/stride), each carrying a digest and count rather
  * than the chunk text (the real writer re-slices the same attribute).
  */
object Chunking {

  /** One row per (doc, window): `chunk_idx`, `chunk_tokens` (the window's
    * actual token count — the tail window may be short), and an md5
    * digest of the space-joined window. Windows start every `stride`
    * tokens; a doc with `L` tokens gets `max(1, ceil((L-width)/stride)+1)`
    * windows, so the final window always reaches the document's end and
    * docs shorter than `width` still yield their single (short) window.
    */
  def tokenChunks(docs: DataFrame, idCol: String, textCol: String,
                  width: Int, stride: Int): DataFrame =
    windowedTokens(docs, idCol, textCol, width, stride)
      .select(col(idCol),
        col("__c.idx").as("chunk_idx"),
        size(col("__c.toks")).cast("long").as("chunk_tokens"),
        md5(array_join(col("__c.toks"), " ")).as("chunk_md5"))

  /** The same windowing with the window TEXT instead of a digest —
    * the passage segmentation of passage-level retrieval
    * ([[Retrieval.maxPassageScores]]'s input side): one row per
    * (doc, window), `(docId, passageId, text)` with
    * `passageId = "<docId>:<idx>"` (string — replayable in the oracle
    * as a concat) and `text` the space-joined window tokens (tokens
    * are `[a-z0-9]+`, so re-tokenizing the passage reproduces the
    * window exactly; PassageSpec pins digest parity with
    * [[tokenChunks]]).
    */
  def tokenPassages(docs: DataFrame, idCol: String, textCol: String,
                    width: Int, stride: Int): DataFrame =
    windowedTokens(docs, idCol, textCol, width, stride)
      .select(col(idCol).as("docId"),
        concat(col(idCol).cast("string"), lit(":"),
          col("__c.idx").cast("string")).as("passageId"),
        array_join(col("__c.toks"), " ").as("text"))

  /** One row per (doc, window) with the raw `(idx, toks)` struct —
    * the windowing [[tokenChunks]] and [[tokenPassages]] share:
    * windows start every `stride` tokens, a doc with `L` tokens gets
    * `max(1, ceil((L-width)/stride)+1)` windows so the final window
    * always reaches the document's end and short docs still yield
    * their single (short) window.
    */
  private def windowedTokens(docs: DataFrame, idCol: String,
                             textCol: String, width: Int,
                             stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1 && stride <= width,
      s"bad chunk shape: width=$width stride=$stride")
    val live = docs
      .filter(col(idCol).isNotNull && lower(col(textCol)).rlike("[a-z0-9]"))
      .select(col(idCol),
        TextFunctions.normalizedWords(col(textCol)).as("__ws"))
    val nChunks = greatest(lit(1L),
      ceil((size(col("__ws")).cast("double") - width) / stride)
        .cast("long") + lit(1L))
    val windows = transform(sequence(lit(0L), nChunks - 1),
      i => struct(i.as("idx"),
        slice(col("__ws"), (i * stride + 1).cast("int"), lit(width))
          .as("toks")))
    // outer explode + a null filter on the OUTPUT attribute: a non-outer
    // Generate would infer size(windows)>0, and pushdown substitutes the
    // tokenizer chain into that filter on its way to the scan (the q23
    // scan-filter trap). nChunks >= 1 makes outer ≡ inner anyway.
    live
      .select(col(idCol), explode_outer(windows).as("__c"))
      .filter(col("__c").isNotNull)
  }

  /** Duplicated-span REMOVAL — the operation `Dedup.chunkStats` only
    * measures (RefinedWeb's "remove duplicated spans" / Lee et al.'s
    * exact-substring dedup at chunk granularity): cut every
    * non-overlapping `width`-token window whose content appears in more
    * than `maxDf` distinct documents, then reassemble each document
    * from its surviving windows in order. Output: (id, clean_text,
    * n_kept_chunks, n_dropped_chunks) — a doc whose every chunk is
    * boilerplate survives with empty text and n_kept_chunks = 0 (the
    * caller's quality gate is the right place to drop it).
    *
    * Scale shape: one tokenizer pass; the only shuffles are the
    * chunk-digest df aggregation (map-side combined, key space =
    * distinct digests) and the id-keyed reassembly agg. The HOT-chunk
    * table (df > maxDf) is bounded by n_chunks / maxDf rows by
    * construction — the same argument as the Jaccard hot-word prune —
    * so it is materialized once and broadcast; corpus chunks never
    * shuffle by content for the membership test.
    */
  def dropDuplicatedChunks(docs: DataFrame, idCol: String, textCol: String,
                           width: Int, maxDf: Long): DataFrame = {
    require(width >= 1, s"width ($width) must be >= 1")
    require(maxDf >= 1, s"maxDf ($maxDf) must be >= 1")
    val live = docs
      .filter(col(idCol).isNotNull && lower(col(textCol)).rlike("[a-z0-9]"))
      .select(col(idCol),
        TextFunctions.normalizedWords(col(textCol)).as("__ws"))
    val nChunks = greatest(lit(1L),
      ceil((size(col("__ws")).cast("double") - width) / width)
        .cast("long") + lit(1L))
    val windows = transform(sequence(lit(0L), nChunks - 1),
      i => struct(i.as("idx"),
        slice(col("__ws"), (i * width + 1).cast("int"), lit(width))
          .as("toks")))
    // outer explode + null filter on the OUTPUT attribute — the q23/q89
    // scan-filter trap rationale (see tokenChunks)
    val chunks = live
      .select(col(idCol), explode_outer(windows).as("__c"))
      .filter(col("__c").isNotNull)
      .select(col(idCol), col("__c.idx").as("__idx"),
        col("__c.toks").as("__toks"),
        md5(array_join(col("__c.toks"), " ")).as("__h"))
    // lazy checkpoint: the hot table still computes exactly ONCE (first
    // action materializes the RDD; the broadcast below reuses it), but
    // merely BUILDING this DataFrame no longer triggers Spark jobs —
    // the operator builder stays lazy like the rest of this file. The
    // cross-doc df aggregation makes the operator batch-only either way.
    val hot = chunks.groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("__h"), lit(1).as("__hot"))
      .localCheckpoint(eager = false)
    // left join + in-agg marker (not an anti-join): the kept/dropped
    // split falls out of ONE id-keyed aggregation — collect_list skips
    // the nulled-out hot chunks
    chunks.join(broadcast(hot), Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(
        sort_array(collect_list(when(col("__hot").isNull,
          struct(col("__idx"), col("__toks"))))).as("__xs"),
        sum(when(col("__hot").isNull, 1L).otherwise(0L))
          .as("n_kept_chunks"),
        sum(when(col("__hot").isNotNull, 1L).otherwise(0L))
          .as("n_dropped_chunks"))
      .select(col(idCol),
        array_join(flatten(transform(col("__xs"),
          x => x.getField("__toks"))), " ").as("clean_text"),
        col("n_kept_chunks"), col("n_dropped_chunks"))
  }

  /** Cross-document LINE dedup (CCNet's paragraph-hash dedup, Wenzek et
    * al. 2020 §3.1; RefinedWeb runs the same stage line-wise): drop
    * every line whose exact content appears in more than `maxDf`
    * distinct documents — navigation menus, cookie banners, share
    * buttons, boilerplate headers — then reassemble each document from
    * its surviving lines in order. Line granularity complements the
    * token-window siblings: [[dropDuplicatedChunks]] cuts fixed token
    * windows (markup-independent but boundary-blind),
    * [[dropDuplicatedSpans]] cuts shingle runs (boundary-exact but
    * token-normalized); line dedup cuts the unit web boilerplate
    * actually repeats at, with the text kept VERBATIM (no tokenizer,
    * no case folding — a line survives byte-identical). ALL occurrences
    * of a hot line are dropped, first included — boilerplate has no
    * privileged first copy.
    *
    * Scale shape mirrors [[dropDuplicatedChunks]]: the only shuffles
    * are the line-hash df aggregation (map-side combined, key space =
    * distinct lines) and the id-keyed reassembly; the hot table
    * (df > maxDf) is bounded by n_lines / maxDf rows by construction,
    * so it broadcasts and corpus lines never shuffle by content.
    * Output: `(id, clean_text, n_kept_lines, n_dropped_lines)`; a doc
    * of pure boilerplate survives with empty text and n_kept_lines = 0
    * (the caller's quality gate drops it). NOTE: blank lines repeated
    * across documents are boilerplate by this definition and get
    * dropped like any other hot line — paragraph breaks DON'T survive
    * corpus-wide dedup; run this before stages that need them or raise
    * `maxDf` past the corpus size for blank-preserving behavior.
    */
  def dropDuplicatedLines(docs: DataFrame, idCol: String, textCol: String,
                          maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"maxDf ($maxDf) must be >= 1")
    // split keeps trailing empty fields (limit -1) so line indexes are
    // stable; posexplode is safe here — split never yields an empty
    // array, so the inferred size>0 predicate is vacuous (no q23-style
    // scan-filter trap: there is no expensive chain to substitute)
    val lines = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .select(col(idCol), col("pos").cast("long").as("__idx"),
        col("col").as("__l"))
      .withColumn("__h", md5(col("__l")))
    val hot = lines.groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("__h"), lit(1).as("__hot"))
      .localCheckpoint(eager = false)
    lines.join(broadcast(hot), Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(
        sort_array(collect_list(when(col("__hot").isNull,
          struct(col("__idx"), col("__l"))))).as("__xs"),
        sum(when(col("__hot").isNull, 1L).otherwise(0L))
          .as("n_kept_lines"),
        sum(when(col("__hot").isNotNull, 1L).otherwise(0L))
          .as("n_dropped_lines"))
      .select(col(idCol),
        array_join(transform(col("__xs"), x => x.getField("__l")), "\n")
          .as("clean_text"),
        col("n_kept_lines"), col("n_dropped_lines"))
  }

  /** WITHIN-document repeated-span removal: drop every token covered by
    * a `width`-token run that already occurred EARLIER in the same
    * document — the in-document half of span dedup (concatenated pages
    * repeating a header, templated sections, chatbot loops; the
    * phenomenon `TextAnalysis.repetitionStats` measures and Gopher's
    * repetition caps gate on, removed instead of gated). The FIRST
    * occurrence of a run survives; later occurrences are cut, and
    * overlapping repeated runs merge into maximal removed spans exactly
    * like [[dropDuplicatedSpans]].
    *
    * Scale shape: perfectly row-local — one tokenizer pass, the
    * first-seen detection is an `array_sort` of the doc's own
    * `(hash, position)` shingle structs (O(m log m) in the doc's
    * length, so a 100k-token book is ~1.7M comparisons in its task,
    * not the ~10¹⁰ of a prefix-scan formulation), ZERO shuffles (the
    * display sort in the gated query is the only exchange).
    * Streaming-safe for the same reason. Output: `(id, clean_text,
    * n_kept_tokens, n_dropped_tokens, n_repeat_starts)`. `carry`
    * names extra input columns to pass through unchanged (e.g. the
    * event-time column in the streaming cascade).
    *
    * NOTE (pipeline-slot semantics): the internal liveness filter
    * DROPS rows whose id is null or whose text has no `[a-z0-9]`
    * character — wiring this operator in as a cascade "rewrite" stage
    * therefore also gates such rows even when the upstream quality
    * gates are disabled. [[graft.pipeline.CurationPipeline]]'s own
    * quality/langid gates subsume the same rows when enabled.
    */
  def dropRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                        width: Int, carry: Seq[String] = Nil): DataFrame = {
    require(width >= 1, s"width ($width) must be >= 1")
    val cs = carry.map(col)
    val live = docs
      .filter(col(idCol).isNotNull && lower(col(textCol)).rlike("[a-z0-9]"))
      .select(col(idCol) +: cs :+
        TextFunctions.normalizedWords(col(textCol)).as("__ws"): _*)
    // per-position (hash, position) shingle structs, SORTED: struct
    // ordering is (h, p), so equal-hash runs are position-ordered and
    // an element REPEATS an earlier position iff it equals its LEFT
    // NEIGHBOR — O(m log m), vs the O(m²) prefix-scan this replaces
    // (array_position over a growing slice per position; a 100k-token
    // book would be a single-task straggler). The hashes come from the
    // native one-pass rolling kernel (O(n) total, vs O(n·width) for
    // md5-per-window; empty below `width`) — internal equality
    // carriers only, never exposed in the output.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sortedShingles = array_sort(
      transform(
        graft.functions.GraftFunctions.spanHashes(col("__ws"), width),
        (h, i) => struct(h.as("h"), i.as("p"))))
    // repeat START positions, ascending: neighbor-equality marks in the
    // (h, p)-sorted array, re-sorted by position
    val repeats = when(size(col("__sh")) >= 2, array_sort(
      transform(
        filter(sequence(lit(1), size(col("__sh")) - 1), i =>
          element_at(col("__sh"), i + 1).getField("h") ===
            element_at(col("__sh"), i).getField("h")),
        i => element_at(col("__sh"), i + 1).getField("p"))))
      .otherwise(array().cast("array<int>"))
    val kept = keptAfterSpanRemoval(col("__ws"), col("__rp"), width)
    live
      // STRUCTURAL materialization barriers: __sh and __rp come out of
      // single-row generators (explode of a one-element array), not
      // projection aliases. A mere alias is fragile — CollapseProject
      // inlines a once-referenced alias into a downstream lambda where
      // it re-runs per ELEMENT (the sort would re-run per shingle —
      // the measured-40×-slower trap, see git history), and
      // reference-counting tricks die as soon as a downstream .drop()
      // prunes the extra reference. A Generate cannot be collapsed
      // into, so the sort and the repeat extraction each run exactly
      // once per row, batch or stream. Neither array is ever null, so
      // outer ≡ inner and no predicate lands below the Generate (the
      // q23 trap).
      .select(col(idCol) +: cs :+ col("__ws") :+
        explode_outer(array(sortedShingles)).as("__sh"): _*)
      .select(col(idCol) +: cs :+ col("__ws") :+
        explode_outer(array(repeats)).as("__rp"): _*)
      .select(col(idCol) +: cs :+ col("__ws") :+
        size(col("__rp")).as("__nrp") :+ kept.as("__kept"): _*)
      .select(col(idCol) +: cs :+
        array_join(col("__kept"), " ").as("clean_text") :+
        size(col("__kept")).cast("long").as("n_kept_tokens") :+
        (size(col("__ws")) - size(col("__kept"))).cast("long")
          .as("n_dropped_tokens") :+
        col("__nrp").cast("long").as("n_repeat_starts"): _*)
  }

  /** Gap-complement span reassembly, shared by [[dropRepeatedSpans]]
    * and [[dropDuplicatedSpans]]: the KEPT index ranges are the
    * complement of the union of `[p, p+width)` over the SORTED
    * ascending removal-start positions `starts`. The gap AFTER the
    * j-th start is `[starts(j)+width, starts(j+1)-1]` (empty when the
    * next start is closer than `width` — clamped below), so the whole
    * complement falls out of neighbor pairs in O(|starts|) and
    * reassembly is plain slice-copies totalling |kept| — linear,
    * vs a per-token `exists` mask's O(|tokens| × |starts|), which
    * degenerates to a single-task O(n²) straggler on a long document
    * that is mostly removable (hot-boilerplate web scrapes).
    * `starts` must be sorted ascending and non-null (duplicates are
    * harmless: their gap clamps to empty).
    */
  private[operators] def keptAfterSpanRemoval(ws: Column, starts: Column,
                                              width: Int): Column = {
    def gap(s: Column, e: Column): Column = struct(s.as("s"), e.as("e"))
    val emptyGaps = array().cast("array<struct<s:int,e:int>>")
    val nTok = size(ws)
    val nrp = size(starts)
    val gaps = concat(
      array(gap(lit(0),
        when(nrp > 0, element_at(starts, 1) - 1).otherwise(nTok - 1))),
      when(nrp >= 2, transform(sequence(lit(1), nrp - 1),
        i => gap(element_at(starts, i) + lit(width),
          element_at(starts, i + 1) - 1)))
        .otherwise(emptyGaps),
      when(nrp > 0,
        array(gap(element_at(starts, nrp) + lit(width), nTok - 1)))
        .otherwise(emptyGaps))
    flatten(transform(gaps, g =>
      slice(ws, g.getField("s") + 1,
        greatest(lit(0), g.getField("e") - g.getField("s") + 1))))
  }

  /** ExactSubstr-grade duplicated-span removal (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better", §3.1
    * semantics at token granularity): remove every token covered by ANY
    * `width`-token run whose content appears in more than `maxDf`
    * distinct documents — at ARBITRARY boundaries, which is exactly
    * what [[dropDuplicatedChunks]]' fixed non-overlapping windows miss
    * (a duplicated run straddling a chunk boundary leaves both chunks
    * non-hot). Stride-1 shingles detect a duplicated run wherever it
    * starts, and overlapping hot shingles merge into one maximal
    * removed span by construction (token coverage is a union). Output:
    * `(id, clean_text, n_kept_tokens, n_dropped_tokens)`.
    *
    * Scale shape: shingle HASHES carry the df aggregation (map-side
    * combined, key space = distinct shingle content), and the per-doc
    * hot-position table — one row per document that CONTAINS a hot
    * span, typically a small corpus fraction — comes back through an
    * id-keyed aggregation. The corpus text itself never shuffles while
    * that table broadcasts (AQE decides; PlanSpec pins it at test
    * scale); past the broadcast threshold the final join shuffles the
    * corpus by id once — the same bound as q96's reassembly
    * aggregation. Two tokenizer passes (shingling + reassembly),
    * mirroring the multi-pass structure of the published suffix-array
    * implementation; reassembly is the shared gap-complement
    * ([[keptAfterSpanRemoval]]) — O(|hot positions|) per row, linear
    * even on a document that is mostly duplicated boilerplate.
    */
  def dropDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                          width: Int, maxDf: Long): DataFrame = {
    require(width >= 1, s"width ($width) must be >= 1")
    require(maxDf >= 1, s"maxDf ($maxDf) must be >= 1")
    val live = docs
      .filter(col(idCol).isNotNull && lower(col(textCol)).rlike("[a-z0-9]"))
      .select(col(idCol),
        TextFunctions.normalizedWords(col(textCol)).as("__ws"))
    // stride-1 per-position span hashes from the native rolling kernel
    // (O(n) per doc vs O(n·width) md5-per-window; empty below `width`).
    // The df key is the PAIR of independent streams — an effective
    // 128-bit key: at a corpus-wide distinct-shingle space of 10¹²⁺, a
    // single 64-bit stream's birthday collisions are certain, and a
    // collision here merges two spans' doc-frequencies and deletes
    // legitimate text. OUTER posexplode + null filter on the OUTPUT
    // attribute — the q23/q89 scan-filter trap rationale (see
    // tokenChunks).
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sh = live
      .select(col(idCol), posexplode_outer(arrays_zip(
        graft.functions.GraftFunctions.spanHashes(col("__ws"), width),
        graft.functions.GraftFunctions.spanHashes2(col("__ws"), width))))
      .withColumnRenamed("pos", "__p").withColumnRenamed("col", "__h")
      .filter(col("__h").isNotNull)
    // lazy checkpoint — same rationale as dropDuplicatedChunks' hot
    // table: one materialization, no jobs at build time, batch-only
    // regardless (the df aggregation is cross-doc)
    val hot = sh.groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("__h"))
      .localCheckpoint(eager = false)
    val hotPos = sh.join(broadcast(hot), Seq("__h"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__p"))).as("__hp"))
    // `__hp` arrives sorted (sort_array above) and position-distinct
    // (one shingle per (doc, position)), so the gap-complement
    // reassembly applies verbatim — O(|hp|) per row, vs the per-token
    // exists mask's O(|tokens| × |hp|), which made a long
    // mostly-boilerplate document (hot positions ≈ tokens) the same
    // single-task O(n²) straggler class the sort-based
    // dropRepeatedSpans eliminated
    live.join(hotPos, Seq(idCol), "left")
      .select(col(idCol), col("__ws"),
        coalesce(col("__hp"), array().cast("array<int>")).as("__hp"))
      .select(col(idCol), col("__ws"),
        keptAfterSpanRemoval(col("__ws"), col("__hp"), width).as("__kept"))
      .select(col(idCol),
        array_join(col("__kept"), " ").as("clean_text"),
        size(col("__kept")).cast("long").as("n_kept_tokens"),
        (size(col("__ws")) - size(col("__kept"))).cast("long")
          .as("n_dropped_tokens"))
  }
}
