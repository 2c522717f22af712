package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions}

/** Bottom-k (KMV, "k minimum values") distinct-value sketches.
  *
  * The sketch of a set is the k smallest hash values of its distinct
  * elements. Unlike HLL registers (see [[Hll]]) a KMV sketch supports
  * INTERSECTION estimation: the k smallest hashes of A ∪ B are a uniform
  * sample of A ∪ B (hashes are i.i.d. uniform), so the fraction of them
  * present in both sides' sketches estimates |A ∩ B| / |A ∪ B| — the
  * Jaccard similarity — without ever joining the underlying sets
  * (Beyer et al., "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations", SIGMOD 2007).
  *
  * The 100 TB shape: the corpus reduces to one k-longs sketch per group
  * in a single pass — distinct (group, hash) with map-side combine, then
  * a two-level bottom-k so no single task ever holds a group's full
  * distinct set — and every cross-group question after that (pairwise
  * vocabulary overlap across sources, dedup-rate planning between two
  * crawl snapshots) runs on |groups| · k longs, broadcastable to
  * anything. Sketches merge by concat + re-sort + truncate, so they can
  * be built per partition/day and unioned later.
  */
object Kmv {

  /** Per-group bottom-k sketch over a string value column:
    * `(group, sketch: array<bigint>)` with the sketch ascending-sorted.
    * Hashes are the portable 60-bit md5 prefix
    * ([[HashFunctions.md5Long]]) so the oracle can reproduce them.
    *
    * Two-level aggregation: distinct values first combine inside 64
    * hash-salt buckets (each task's state is bounded by its bucket's
    * distinct count, and the salt is derived from the hash so the
    * distinct step and the bucket step share a key), then the ≤ 64·k
    * survivors per group fold into the final bottom-k. A group's full
    * distinct set is never collected anywhere.
    */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
                k: Int = 64): DataFrame = {
    require(k >= 1, s"sketch size k=$k must be >= 1")
    val h = HashFunctions.md5Long(col(valueCol))
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), h.as("__h"))
      .groupBy(col(groupCol), pmod(col("__h"), lit(64L)).as("__salt"))
      .agg(slice(sort_array(collect_set(col("__h"))), 1, k).as("__bk"))
      .select(col(groupCol), explode(col("__bk")).as("__h"))
      .groupBy(col(groupCol))
      .agg(slice(sort_array(collect_set(col("__h"))), 1, k).as("sketch"))
  }

  /** Per-group vocabulary sketch: bottom-k over the distinct normalized
    * tokens of each group's documents — the input to cross-source
    * overlap estimation. One tokenizer pass; the explode is outer so
    * the tokenizer chain stays out of scan filters (the q21 trap).
    */
  def vocabSketch(docs: DataFrame, groupCol: String, textCol: String,
                  k: Int = 64): DataFrame =
    kmvSketch(
      docs
        .filter(lower(col(textCol)).rlike("[a-z0-9]"))
        .select(col(groupCol),
          TextFunctions.normalizedWords(col(textCol)).as("__ws"))
        .select(col(groupCol), explode_outer(col("__ws")).as("word")),
      groupCol, "word", k)

  /** Pairwise Jaccard estimates between all groups' sketches:
    * `(group_a, group_b, n_union_sample, n_shared, est_jaccard)` for
    * every unordered pair, `group_a < group_b`.
    *
    * For each pair the union's bottom-k is the bottom-k of the merged
    * sketches (KMV closure under union); `n_shared` counts its members
    * present in BOTH input sketches, and `est_jaccard = n_shared /
    * n_union_sample` (the union sample can be shorter than k when the
    * union itself has fewer than k distinct values — then the estimate
    * is exact). Pure array expressions over a |groups|²-row frame;
    * nothing here touches the corpus.
    */
  def kmvCrossJaccard(sketches: DataFrame, groupCol: String,
                      k: Int = 64): DataFrame = {
    require(k >= 1, s"sketch size k=$k must be >= 1")
    val a = sketches.select(col(groupCol).as("group_a"),
      col("sketch").as("__sa"))
    val b = sketches.select(col(groupCol).as("group_b"),
      col("sketch").as("__sb"))
    a.join(b, col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"),
        slice(sort_array(array_union(col("__sa"), col("__sb"))), 1, k)
          .as("__u"),
        col("__sa"), col("__sb"))
      .select(col("group_a"), col("group_b"),
        size(col("__u")).as("n_union_sample"),
        size(array_intersect(array_intersect(col("__u"), col("__sa")),
          col("__sb"))).as("n_shared"))
      .withColumn("est_jaccard",
        round(col("n_shared").cast("double") /
          col("n_union_sample").cast("double"), 6))
  }
}
