package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Portable HyperLogLog: approximate distinct counting whose REGISTERS
  * are deterministic integers derivable in any SQL engine (md5-based
  * hash, trailing-zero rank), unlike `approx_count_distinct`'s opaque
  * engine-specific sketch. Registers are exact/gateable; the estimate is
  * standard double math on top.
  *
  * Scale shape: one hash-partitioned aggregation producing m registers
  * per group — the shuffle carries at most m rows per (partition, group)
  * thanks to map-side partial max. Registers merge with elementwise max,
  * so sketches of disjoint corpus shards union for free.
  */
object Hll {

  /** Register table: (groupCols..., bucket, rho) with rho = the maximum
    * over values of (trailing zeros of h div m) + 1 — the trailing-zero
    * formulation because `log2(w & -w)` is exact in float64 (its input is
    * a power of two), which the leading-zero rank is not.
    * Missing buckets mean rho 0 (no value hashed there).
    */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                m: Int = 256): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    val gcols = groupCols.map(col)
    // md5Long is a 60-bit hash, so w = h div m has 60 - log2(m) bits and
    // the all-zeros sentinel is that width + 1 (one past any real rank —
    // a w of exactly 2^(width-1) ranks width, the sentinel must exceed it)
    val wBits = 60 - java.lang.Long.numberOfTrailingZeros(m.toLong)
    df
      .filter(col(valueCol).isNotNull)
      // md5 once per value into its own column, then integer-only math
      .select(gcols :+ HashFunctions.md5Long(col(valueCol)).as("__h"): _*)
      .select(gcols ++ Seq(
        pmod(col("__h"), lit(m)).cast("long").as("bucket"),
        expr(s"__h div $m").as("__w")): _*)
      .select(gcols ++ Seq(col("bucket"),
        when(col("__w") === 0, lit(wBits + 1L))
          .otherwise(log2(col("__w").bitwiseAND(-col("__w"))).cast("long")
            + 1L).as("__rho")): _*)
      .groupBy(gcols :+ col("bucket"): _*)
      .agg(max(col("__rho")).as("rho"))
  }

  /** Raw HLL estimate per group from a register table:
    * `alpha_m * m^2 / (zeros + sum 2^-rho)` with the standard small-range
    * (linear counting) correction. Double math — use for monitoring and
    * planning, not for exact gates.
    */
  def estimate(registers: DataFrame, groupCols: Seq[String],
               m: Int = 256): DataFrame = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), -col("rho"))).as("__sum"),
        count(lit(1)).as("__nonzero"))
      .withColumn("__zeros", lit(m.toDouble) - col("__nonzero"))
      .withColumn("__raw",
        lit(alpha * m * m) / (col("__sum") + col("__zeros")))
      .withColumn("estimate",
        when(col("__raw") <= 2.5 * m && col("__zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__zeros")))
          .otherwise(col("__raw")))
      .drop("__sum", "__nonzero", "__zeros", "__raw")
  }
}
