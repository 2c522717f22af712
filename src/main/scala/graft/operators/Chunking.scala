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
}
