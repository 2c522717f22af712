package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions}

/** Sequence packing: assign documents to fixed token-budget training
  * sequences ("packs"). The pipeline step between curation and the
  * trainer — after filtering and dedup, documents are concatenated into
  * budget-sized sequences, and the assignment must be deterministic so
  * that re-runs and shard-parallel writers produce the same batches.
  *
  * Packing is offset-based: within a shard, documents are ordered by id,
  * token counts accumulate, and a document's pack is
  * `floor((cum − own) / budget)` — i.e. a doc belongs to the pack where
  * its first token lands, and packs overflow their budget by at most one
  * document's tail (the trainer's tokenizer splits at exact token
  * boundaries downstream). This is the SQL-expressible semantics; true
  * greedy bin-packing is inherently sequential and buys back at most one
  * partial document per pack.
  *
  * Scale shape: a global order would funnel 100 TB through one sorted
  * partition, so documents first scatter across `shards` by a hash of
  * their id ([[HashFunctions.md5Long]] — deterministic, engine-portable,
  * independent of physical partitioning). Each shard packs independently
  * under one window (`partitionBy shard, orderBy id`): one shuffle by
  * shard, per-shard sorts, no global coordination. Size `shards` so a
  * shard's (id, n_tokens) rows fit an executor — the window carries two
  * longs per doc, never the text.
  */
object Packing {

  /** Per-document pack assignment: (id, shard, n_tokens, cum_tokens,
    * pack_id). `pack_id` counts from 0 within each shard.
    */
  def assignPacks(docs: DataFrame, idCol: String, textCol: String,
                  budget: Long, shards: Int): DataFrame = {
    require(budget >= 1 && shards >= 1,
      s"bad packing shape: budget=$budget shards=$shards")
    val counted = docs
      .filter(col(idCol).isNotNull && lower(col(textCol)).rlike("[a-z0-9]"))
      .select(col(idCol),
        TextFunctions.wordCount(col(textCol)).cast("long").as("n_tokens"),
        pmod(HashFunctions.md5Long(concat(lit("pack:"), col(idCol))),
          lit(shards.toLong)).as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    counted
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col("n_tokens")).cast("double") / budget))
      .select(col(idCol), col("shard"), col("n_tokens"),
        col("cum_tokens"), col("pack_id"))
  }

  /** Pack-level rollup: doc count, token total, and an md5 digest of the
    * id-ordered concatenated text per (shard, pack). The digest stands in
    * for the materialized training sequence (the real writer streams the
    * same deterministic order) while keeping result rows fixed-width.
    * `collect_list` has no intra-group order guarantee, so the texts ride
    * in (id, text) structs and are `array_sort`ed before joining —
    * determinism comes from the sort, not the shuffle.
    */
  def packDigests(docs: DataFrame, idCol: String, textCol: String,
                  budget: Long, shards: Int): DataFrame = {
    val assigned = assignPacks(docs, idCol, textCol, budget, shards)
      .join(docs.select(col(idCol), col(textCol)), idCol)
    assigned
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col(idCol), col(textCol)))),
          s => s.getField(textCol)))).as("pack_md5"))
  }
}
