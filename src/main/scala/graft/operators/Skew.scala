package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation tools. First line of defense is AQE
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default), which splits
  * skewed SHUFFLE partitions at runtime. Salting is the explicit fallback
  * for the case AQE cannot fix: one join key so hot that every row of it
  * must still hash to one reducer in the OTHER stage consuming the join
  * (e.g. a following aggregation), or a build side too big to broadcast.
  */
object Skew {

  /** Salted equi-join: spread one hot key's rows over `salts` reducers.
    *
    * The skewed side gets a deterministic per-row salt in [0, salts) (from
    * `saltBy`, any expression that varies within the hot key — a row id);
    * the other side is replicated `salts` times so every (key, salt)
    * bucket still sees its full match set. Join keys become
    * (keys..., salt): same rows out as the plain join, `salts`-way finer
    * shuffle granularity in.
    *
    * Cost model: replication multiplies the OTHER side by `salts` — use
    * when other ≪ skewed (dimension-table shape, yet too big or too
    * dynamic to broadcast).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 saltBy: Column, salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // a null salt would silently drop the row from the inner equi-join —
    // route null-salted rows to bucket 0 instead (plain-join parity)
    val l = skewed.withColumn("__salt",
      coalesce(pmod(saltBy.cast("long"), lit(salts.toLong)), lit(0L)))
    val r = other.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
