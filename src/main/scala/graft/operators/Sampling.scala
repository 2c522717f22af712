package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Reproducible sampling for corpus curation — hash-based, not RNG-based.
  *
  * `df.sample()` draws from a partition-dependent RNG stream: results
  * change under repartitioning, retries, and engine versions, which is
  * exactly what a training pipeline cannot afford for held-out splits.
  * These operators decide membership from `md5(seed:key)` alone, so a
  * row's assignment is a pure function of its key — stable across runs,
  * partitionings, cluster sizes, and engines (the DuckDB oracle
  * re-derives it), and trivially consistent between separate jobs that
  * must agree on the same split (train vs eval readers).
  *
  * All decisions are narrow per-row projections (no shuffle); `groupCap`
  * adds one shuffle by group for its window.
  *
  * Rows with a NULL key are dropped by every operator here (a null key
  * has no hash, hence no bucket) — filter or coalesce keys upstream if
  * null-keyed rows must survive sampling.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform pseudo-random bucket in [0, 10^6) from (seed, key). */
  private def bucket(keyCol: Column, seed: String): Column =
    pmod(HashFunctions.md5Long(
      concat(lit(seed), lit(":"), keyCol.cast("string"))), lit(Buckets))

  /** Keep ~`fraction` of rows, decided per key. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 seed: String = "graft"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.filter(bucket(col(keyCol), seed) < (fraction * Buckets).toLong)
  }

  /** Assign every row a split label with proportions `weights`
    * (label -> weight, normalized; evaluated in the given order so the
    * assignment is deterministic). Adds a `split` column.
    */
  def hashSplit(df: DataFrame, keyCol: String,
                weights: Seq[(String, Double)],
                seed: String = "graft"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .map(c => (c * Buckets).toLong)
    val b = bucket(col(keyCol), seed)
    val expr = weights.zip(cuts.sliding(2).toSeq).tail
      .foldLeft(when(b < cuts(1), lit(weights.head._1))) {
        case (acc, ((label, _), Seq(_, hi))) => acc.when(b < hi, lit(label))
      }
    // the final bucket takes any remainder from integer cut truncation
    df.withColumn("split", coalesce(expr, lit(weights.last._1)))
  }

  /** [[hashSplit]] made leakage-safe under near-duplication: every
    * member of a near-dup cluster lands in the SAME split. Two
    * near-identical documents straddling train and test silently
    * inflate held-out metrics (the classic dedup-leakage result — Lee
    * et al. 2022 §6 measure exactly this); hashing the raw doc key
    * cannot prevent it because cluster members have different keys. So
    * the split decision hashes the CLUSTER id — the `component` label
    * from [[Dedup.connectedComponents]]/[[Dedup.connectedComponentsStar]]
    * over the near-dup candidate graph — and docs outside any cluster
    * (no near-dup edge, hence absent from `components`) fall back to
    * their own key, which IS their singleton cluster id.
    *
    * One shuffled left join against the membership table (cluster
    * members only — much smaller than the corpus after curation) plus
    * the same narrow hash projection as `hashSplit`. Output adds
    * `split_key` (the hashed cluster id) and `split`.
    */
  def clusterSafeSplit(df: DataFrame, keyCol: String,
                       components: DataFrame,
                       weights: Seq[(String, Double)],
                       seed: String = "graft",
                       idCol: String = "id",
                       compCol: String = "component"): DataFrame = {
    val membership = components.select(
      col(idCol).as(keyCol), col(compCol).as("__comp"))
    val keyed = df.join(membership, Seq(keyCol), "left")
      .withColumn("split_key", coalesce(col("__comp"), col(keyCol)))
      .drop("__comp")
    hashSplit(keyed, "split_key", weights, seed)
  }

  /** Weighted per-source downsampling (corpus mixing): keep a
    * source-dependent fraction of rows — e.g. all of a high-quality
    * source, 10% of a web crawl — decided by the same portable
    * (seed, key) hash as `hashSample`, so membership is stable across
    * runs, partitionings, and engines, and two jobs sampling the same
    * corpus agree row-for-row. `weights` maps a source value to its keep
    * fraction; unlisted sources keep `defaultFraction`. Fractions are
    * converted to integer bucket cutoffs ON THE DRIVER (truncating), so
    * the per-row predicate compares two longs and an oracle can state
    * the cutoffs as exact literals. One narrow projection, no shuffle.
    */
  def sourceMix(df: DataFrame, keyCol: String, sourceCol: String,
                weights: Seq[(String, Double)],
                defaultFraction: Double = 1.0,
                seed: String = "graft"): DataFrame = {
    require((defaultFraction +: weights.map(_._2))
      .forall(w => w >= 0.0 && w <= 1.0), "fractions must be in [0,1]")
    val cut = weights.reverse
      .foldLeft(lit((defaultFraction * Buckets).toLong): Column) {
        case (els, (s, w)) =>
          when(col(sourceCol) === lit(s), lit((w * Buckets).toLong))
            .otherwise(els)
      }
    df.filter(bucket(col(keyCol), seed) < cut)
  }

  /** Temperature-rebalanced source mixing (T = 2, the common √-scaling
    * used to flatten multilingual / multi-source corpora): a source with
    * `n` rows keeps `min(1, keepLargest · sqrt(max_n / n))` of them, so
    * the largest source keeps `keepLargest` and smaller sources keep
    * progressively larger fractions (capped at all of them) — expected
    * kept counts are proportional to `sqrt(n)`, i.e. `n^(1/T)`.
    *
    * The rates are DERIVED FROM THE DATA in one pass (count by source —
    * source cardinality is tiny, so the agg and the join back broadcast),
    * then membership is the same portable (seed, key) hash decision as
    * `hashSample`. Only IEEE-exact double ops (sqrt, ·, /, floor) produce
    * the cutoff, so an oracle restating the same expression agrees
    * bit-for-bit. The corpus itself never shuffles: one narrow filter
    * against a broadcast rate table.
    */
  def temperatureMix(df: DataFrame, keyCol: String, sourceCol: String,
                     keepLargest: Double = 1.0,
                     seed: String = "graft"): DataFrame = {
    require(keepLargest > 0.0 && keepLargest <= 1.0,
      "keepLargest must be in (0,1]")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
    val maxN = counts.agg(max(col("__n")).as("__max_n"))
    val cuts = counts.crossJoin(broadcast(maxN))
      .select(col(sourceCol),
        floor(least(lit(1.0), lit(keepLargest) *
          sqrt(col("__max_n").cast("double") / col("__n").cast("double")))
          * lit(1000000.0)).cast("long").as("__cut"))
    df.join(broadcast(cuts), sourceCol)
      .filter(bucket(col(keyCol), seed) < col("__cut"))
      .drop("__cut")
  }

  /** Cap each group at `n` rows, chosen by hash order (then key, for
    * determinism on hash ties) — a stable per-group subsample, e.g. "at
    * most 10 documents per source domain".
    */
  def groupCap(df: DataFrame, groupCols: Seq[String], keyCol: String,
               n: Int, seed: String = "graft"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(bucket(col(keyCol), seed).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
