package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Portable Bloom filter: `m` bits, `k` hash functions, bit positions from
  * the md5 scheme ([[HashFunctions.md5Long]] of `"<j>:<token>"` mod `m`).
  * Completes the sketch family next to [[Hll]] (distinct counts),
  * [[CountMin]] (frequencies), and MinHash/SimHash (similarity): a Bloom
  * filter answers *membership* — "might this item be in the reference
  * set?" — with one-sided error (false positives only, never false
  * negatives), deterministic here because the hashes are.
  *
  * The 100 TB use is [[Decontaminate]]'s asymmetry flipped to its limit:
  * the posting-list join shuffles BOTH corpora by shingle, but a Bloom
  * filter of the small benchmark side is a few MB of bit rows built in one
  * aggregation pass — broadcast it, and probing the 100 TB training corpus
  * is pure map-side work: k broadcast hash joins and a per-doc partial
  * aggregation. The big side never shuffles a single row by content.
  * Filters MERGE by unioning bit rows (OR), like the other sketches.
  */
object Bloom {

  private def position(tokenCol: Column, j: Int, m: Int): Column =
    pmod(HashFunctions.md5Long(concat(lit(s"$j:"), tokenCol)), lit(m.toLong))

  /** The filter itself: distinct set-bit positions over `tokenCol` of
    * `items`. One aggregation pass (explode k positions per item →
    * distinct), at most `min(m, k·|items|)` rows of one BIGINT — the
    * broadcastable sketch. The inner explode is safe here: the generator
    * input is an inline k-element array literal, whose size folds to a
    * constant instead of inferring a filter over the hash chain.
    */
  def bits(items: DataFrame, tokenCol: String,
           m: Int = 1 << 16, k: Int = 3): DataFrame = {
    require(m >= 1 && k >= 1, s"bad filter shape: m=$m k=$k")
    val positions = array((0 until k).map(j =>
      position(col(tokenCol), j, m)): _*)
    items
      .filter(col(tokenCol).isNotNull)
      .select(explode(positions).as("bit"))
      .distinct()
  }

  /** Per-document probe statistics for exploded `(id, token)` probes
    * against a bit frame from [[bits]]: `n_probes` tokens probed and
    * `n_maybe` whose k bits are ALL set (Bloom "might contain" — for
    * decontamination, a doc with `n_maybe > 0` shares an n-gram with the
    * reference set, up to the filter's false-positive rate).
    *
    * Shape: k broadcast hash joins (one per hash function, each keyed on
    * the recomputed position expression) — the probe side never shuffles;
    * the only exchange is the final per-id partial aggregation. That is
    * the whole point of probing a sketch instead of posting-joining.
    */
  def probeStats(bitsDf: DataFrame, probes: DataFrame,
                 idCol: String, tokenCol: String,
                 m: Int = 1 << 16, k: Int = 3): DataFrame = {
    require(m >= 1 && k >= 1, s"bad filter shape: m=$m k=$k")
    val withHits = (0 until k).foldLeft(
      probes.select(col(idCol), col(tokenCol))) { (df, j) =>
      df.join(broadcast(bitsDf.select(col("bit").as(s"__b$j"))),
        position(col(tokenCol), j, m) === col(s"__b$j"), "left")
    }
    val maybe = (0 until k).map(j => col(s"__b$j").isNotNull)
      .reduce(_ && _)
    withHits.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_probes"),
      sum(when(maybe, 1L).otherwise(0L)).as("n_maybe"))
  }
}
