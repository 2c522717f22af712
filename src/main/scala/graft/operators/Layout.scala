package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the Z-order
  * (Morton-curve) clustering that lakehouse table optimizers run
  * (Delta `OPTIMIZE ZORDER BY`, Iceberg sort orders): rows that are
  * close in SEVERAL filter columns land in the same files, so the
  * per-file min/max column statistics prune a multi-predicate scan in
  * every one of those dimensions — where a plain sort prunes only its
  * leading column.
  *
  * At 100 TB this is the difference between a query on
  * `(customer, price-band)` reading a few files and reading the whole
  * table: layout is the ONLY pruning mechanism that survives when the
  * predicate doesn't include the partition key. Everything here is
  * pure built-in expressions + `repartitionByRange` — Catalyst and the
  * writer see an ordinary range-partitioned column.
  *
  * Reference behavior: jaccard-mapreduce has no storage layout
  * machinery; this is part of the demanded training-data-pipeline
  * extension surface (a 100 TB corpus is re-clustered before heavy
  * multi-column slicing).
  */
object Layout {

  /** Morton z-value of pre-quantized bucket ids: bit i of dimension j
    * lands at position `i * nDims + j`. Pure shift/mask/or expression
    * tree — whole-stage-codegen, `bits * nDims <= 63`.
    *
    * PRECONDITION: every bucket value must lie in `[0, 2^bits)` (what
    * [[bucketOf]] guarantees by construction). An out-of-range value
    * raises at execution rather than silently dropping its high bits —
    * dropped bits would make distant values COLLIDE in z-space, quietly
    * destroying the clustering the layout exists for. Null buckets pass
    * through to a null z-value (null rows range-partition
    * deterministically).
    */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.size >= 2, "zValue: need at least 2 dimensions")
    require(bits >= 1 && bits * buckets.size <= 63,
      s"zValue: bits=$bits × ${buckets.size} dims must fit a signed long")
    val n = buckets.size
    val k = 1L << bits
    // null condition is null → falls to otherwise → null propagates
    val checked = buckets.map(c =>
      when(c < 0 || c >= k,
        raise_error(concat(
          lit(s"zValue: bucket value out of [0, $k): "), c.cast("string")))
          .cast("long"))
        .otherwise(c.cast("long")))
    val terms = for {
      (c, j) <- checked.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Equi-depth cut points (rounded to 6 dp — the q97 contract,
    * reproducible against `quantile_cont`) for quantizing one column
    * into `2^bits` buckets. Driver-side scalar list, model-sized
    * (`2^bits − 1` doubles). `exact = false` swaps the exact
    * percentile for `approx_percentile` — the 100 TB form: an exact
    * percentile materializes every value per aggregation group while
    * the approx form carries a bounded sketch per task, and the layout
    * only needs coarse equi-depth bins (also why `bits` stays small).
    * The exact form remains the default and the oracle-gated path.
    */
  def equiDepthCuts(df: DataFrame, colName: String, bits: Int,
                    exact: Boolean = true): Seq[Double] = {
    require(bits >= 1 && bits <= 6,
      s"equiDepthCuts: bits=$bits — the bucket expression folds 2^bits-1 " +
        "comparison terms, keep it small (layout needs only coarse bins)")
    equiDepthCutsAll(df, Seq(colName), bits, exact).head
  }

  /** [[equiDepthCuts]] for SEVERAL columns in ONE aggregation pass —
    * z-ordering a 100 TB table by 4 columns must not scan it 4 times
    * for the cut points.
    */
  def equiDepthCutsAll(df: DataFrame, colNames: Seq[String],
                       bits: Int, exact: Boolean = true): Seq[Seq[Double]] = {
    require(bits >= 1 && bits <= 6,
      s"equiDepthCuts: bits=$bits — the bucket expression folds 2^bits-1 " +
        "comparison terms, keep it small (layout needs only coarse bins)")
    require(colNames.nonEmpty, "equiDepthCutsAll: no columns")
    val k = 1 << bits
    val probs = (1 until k).map(_.toDouble / k)
    // round on the ENGINE (the q97 percentile-cutpoint contract —
    // Spark round(x, 6) vs DuckDB round(x, 6) is the validated pairing).
    // Column API throughout (col() handles names needing quoting —
    // spaces/dots/hyphens — that raw-SQL interpolation would misparse).
    // Approx accuracy 10_000 bounds rank error to n/10000 per cut —
    // far finer than the coarse bins the layout quantizes into
    def cutsOf(c: String): Column =
      if (exact) percentile(col(c), lit(probs.toArray))
      else percentile_approx(col(c), lit(probs.toArray), lit(10000))
    val row = df.select(colNames.map(c =>
      transform(cutsOf(c), x => round(x.cast("double"), 6))): _*)
      .head()
    colNames.indices.map { i =>
      val cuts = row.getSeq[Double](i)
      // percentile over zero non-null rows yields null — surface a
      // clear error instead of an NPE deep inside bucketOf
      require(cuts != null,
        s"equiDepthCuts: column '${colNames(i)}' has no non-null rows " +
          "(empty input?) — no cut points derivable")
      cuts
    }
  }

  /** Equi-depth bucket id of `c` against driver-computed cut points:
    * `sum_i [c > cut_i]` — a flat codegen sum of comparisons, no
    * window, no join. Null → null (drops out of a z-ordered write's
    * range partitioner deterministically).
    */
  def bucketOf(c: Column, cuts: Seq[Double]): Column =
    // explicit null guard: `null > cut` is null and would fall through
    // every when/otherwise into bucket 0, silently z-clustering all
    // null rows with the smallest values
    when(c.isNull, lit(null).cast("long"))
      .otherwise(cuts.map(cut => when(c > lit(cut), 1L).otherwise(0L))
        .reduce(_ + _))

  /** Z-order clustering of `df` by `cols` (numeric): each column is
    * equi-depth-quantized to `bits` bits, the Morton value interleaves
    * the bucket ids, and `repartitionByRange` on that value gives every
    * output partition a compact multi-dimensional box — which is what
    * makes per-file min/max stats selective in EVERY `cols` dimension.
    * Rows are additionally SORTED by the z-value inside each partition
    * (`sortWithinFiles`, default on): a parquet writer then gets
    * z-contiguous row groups, so ROW-GROUP min/max stats prune inside
    * the files too, not just across them — no extra shuffle, the sort
    * is partition-local. One extra pass for the cut points (model-sized
    * result), one range shuffle — the cost profile of any
    * table-optimize run.
    */
  def zorderRepartition(df: DataFrame, cols: Seq[String], bits: Int,
                        numPartitions: Int,
                        sortWithinFiles: Boolean = true,
                        exactCuts: Boolean = true): DataFrame = {
    val cuts = equiDepthCutsAll(df, cols, bits, exactCuts) // ONE scan, all dims
    val z = zValue(cols.zip(cuts).map { case (c, cu) =>
      bucketOf(col(c), cu) }, bits)
    val ranged = df.repartitionByRange(numPartitions, z)
    if (sortWithinFiles) ranged.sortWithinPartitions(z) else ranged
  }

  /** The full table-OPTIMIZE run: [[compactionPlan]] sizes the output
    * file count, [[zorderRepartition]] lays the rows out so each of the
    * `n_files` output files is a compact multi-dimensional box — one
    * metadata-sized planning aggregation, one cut-point scan, one range
    * shuffle. Write the result with one file per partition (the
    * default parquet writer behavior) and every file is both
    * target-sized AND z-prunable. At 100 TB run it per table-partition
    * with `exactCuts = false`.
    */
  def optimizeTable(df: DataFrame, cols: Seq[String], bits: Int,
                    sizeExpr: Column, targetBytes: Long,
                    exactCuts: Boolean = true): DataFrame = {
    val n = compactionPlan(df, sizeExpr, targetBytes)
      .head().getAs[Long]("n_files")
    require(n <= Int.MaxValue,
      s"optimizeTable: planned $n files exceeds Int.MaxValue — raise " +
        "targetBytes")
    zorderRepartition(df, cols, bits, n.toInt, sortWithinFiles = true,
      exactCuts = exactCuts)
  }

  /** Compaction sizing — the other half of a table-optimize run: the
    * output file count that packs `sizeExpr` bytes per row into
    * `targetBytes`-sized files. One aggregation (two running scalars),
    * `n_files = max(1, ceil(total / target))`. Output one row:
    * `(n_rows, total_bytes, n_files)` — feed `n_files` to
    * `repartition`/[[zorderRepartition]] before the write. A 100 TB
    * table plans per PARTITION of the table, not globally; the math is
    * the same scalar per partition.
    */
  def compactionPlan(df: DataFrame, sizeExpr: Column,
                     targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"compactionPlan: targetBytes=$targetBytes")
    df.agg(count(lit(1)).as("n_rows"),
      coalesce(sum(sizeExpr.cast("long")), lit(0L)).as("total_bytes"))
      .select(col("n_rows"), col("total_bytes"),
        greatest(lit(1L),
          ceil(col("total_bytes").cast("double") / targetBytes).cast("long"))
          .as("n_files"))
  }

  /** Apply [[compactionPlan]]: repartition to the planned file count
    * (driver reads ONE scalar row — model-sized by definition).
    */
  def compactTo(df: DataFrame, sizeExpr: Column,
                targetBytes: Long): DataFrame = {
    val n = compactionPlan(df, sizeExpr, targetBytes)
      .head().getAs[Long]("n_files")
    // a plan past Int.MaxValue files means the target is misconfigured
    // (n.toInt would silently wrap) — fail loudly
    require(n <= Int.MaxValue,
      s"compactTo: planned $n files exceeds Int.MaxValue — raise targetBytes")
    df.repartition(n.toInt)
  }
}
