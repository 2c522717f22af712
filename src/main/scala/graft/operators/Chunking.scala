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
                  width: Int, stride: Int): DataFrame = {
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
      .select(col(idCol),
        col("__c.idx").as("chunk_idx"),
        size(col("__c.toks")).cast("long").as("chunk_tokens"),
        md5(array_join(col("__c.toks"), " ")).as("chunk_md5"))
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
    val hot = chunks.groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("__h"), lit(1).as("__hot"))
      .localCheckpoint()
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
    * first-seen mask is a per-row fold over the doc's own shingle
    * hashes, ZERO shuffles (the display sort in the gated query is the
    * only exchange). Streaming-safe for the same reason. Output:
    * `(id, clean_text, n_kept_tokens, n_dropped_tokens,
    * n_repeat_starts)` — the last doubles as the audit count AND the
    * second top-level reference that keeps the repeat scan out of the
    * mask lambda (see the in-code comment). `carry` names extra input
    * columns to pass through unchanged (e.g. the event-time column in
    * the streaming cascade).
    */
  def dropRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                        width: Int, carry: Seq[String] = Nil): DataFrame = {
    require(width >= 1, s"width ($width) must be >= 1")
    val cs = carry.map(col)
    val live = docs
      .filter(col(idCol).isNotNull && lower(col(textCol)).rlike("[a-z0-9]"))
      .select(col(idCol) +: cs :+
        TextFunctions.normalizedWords(col(textCol)).as("__ws"): _*)
    // per-position shingle hashes (empty below `width` — sequence()
    // counts DOWN for a negative stop, hence the guard)
    val hashes = when(size(col("__ws")) >= width,
      transform(sequence(lit(0), size(col("__ws")) - width),
        p => md5(array_join(slice(col("__ws"), p + 1, lit(width)), " "))))
      .otherwise(array().cast("array<string>"))
    // a position p REPEATS iff its hash appears among positions < p:
    // array_position over a PREFIX SLICE of the fixed hash array.
    // |positions|² worst-case comparisons stay inside one row, with no
    // per-step array building (a fold accumulating a `seen` array
    // copies a growing array per element — measured 50× slower)
    val repeats = when(size(col("__h")) > 0, filter(
      transform(sequence(lit(0), size(col("__h")) - 1), p => p),
      p => array_position(slice(col("__h"), lit(1), p),
        element_at(col("__h"), p + 1)) > 0))
      .otherwise(array().cast("array<int>"))
    live
      .select(col(idCol) +: cs :+ col("__ws") :+ hashes.as("__h"): _*)
      // STRUCTURAL materialization barrier: __rp comes out of a
      // single-row generator (explode of a one-element array), not a
      // projection alias. A mere alias is fragile — CollapseProject
      // inlines a once-referenced alias into the mask's filter lambda
      // where it re-runs per TOKEN (measured 40× slower at sf0.1), and
      // reference-counting tricks die as soon as a downstream .drop()
      // prunes the extra reference (measured: a nested-inline runaway
      // in the streaming cascade). A Generate cannot be collapsed
      // into, so the repeat scan runs exactly once per row, batch or
      // stream. `repeats` is never null, so outer ≡ inner and no
      // predicate ever lands below the Generate (the q23 trap).
      .select(col(idCol) +: cs :+ col("__ws") :+
        explode_outer(array(repeats)).as("__rp"): _*)
      .select(col(idCol) +: cs :+ col("__ws") :+
        size(col("__rp")).as("__nrp") :+
        filter(col("__ws"), (_, i) =>
          !exists(col("__rp"), p => p <= i && i < p + width)).as("__kept"): _*)
      .select(col(idCol) +: cs :+
        array_join(col("__kept"), " ").as("clean_text") :+
        size(col("__kept")).cast("long").as("n_kept_tokens") :+
        (size(col("__ws")) - size(col("__kept"))).cast("long")
          .as("n_dropped_tokens") :+
        col("__nrp").cast("long").as("n_repeat_starts"): _*)
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
    * implementation; the reassembly mask is a per-row index-filter
    * fold, |tokens|·|hot positions in doc| work.
    */
  def dropDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                          width: Int, maxDf: Long): DataFrame = {
    require(width >= 1, s"width ($width) must be >= 1")
    require(maxDf >= 1, s"maxDf ($maxDf) must be >= 1")
    val live = docs
      .filter(col(idCol).isNotNull && lower(col(textCol)).rlike("[a-z0-9]"))
      .select(col(idCol),
        TextFunctions.normalizedWords(col(textCol)).as("__ws"))
    // stride-1 shingle start positions; docs shorter than `width`
    // contribute none (sequence() would count DOWN for a negative stop,
    // hence the explicit guard)
    val starts = when(size(col("__ws")) >= width,
      sequence(lit(0), size(col("__ws")) - width))
      .otherwise(array().cast("array<int>"))
    // outer explode + null filter on the OUTPUT attribute — the q23/q89
    // scan-filter trap rationale (see tokenChunks)
    val sh = live
      .select(col(idCol), explode_outer(transform(starts,
        p => struct(p.as("p"),
          md5(array_join(slice(col("__ws"), p + 1, lit(width)), " "))
            .as("h")))).as("__s"))
      .filter(col("__s").isNotNull)
      .select(col(idCol), col("__s.p").as("__p"), col("__s.h").as("__h"))
    val hot = sh.groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("__h"))
      .localCheckpoint()
    val hotPos = sh.join(broadcast(hot), Seq("__h"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__p"))).as("__hp"))
    live.join(hotPos, Seq(idCol), "left")
      .select(col(idCol), col("__ws"),
        coalesce(col("__hp"), array().cast("array<int>")).as("__hp"))
      .select(col(idCol), col("__ws"),
        filter(col("__ws"), (_, i) =>
          !exists(col("__hp"), p => p <= i && i < p + width)).as("__kept"))
      .select(col(idCol),
        array_join(col("__kept"), " ").as("clean_text"),
        size(col("__kept")).cast("long").as("n_kept_tokens"),
        (size(col("__ws")) - size(col("__kept"))).cast("long")
          .as("n_dropped_tokens"))
  }
}
