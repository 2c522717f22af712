package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, composed from
  * shuffle-friendly primitives (no per-row range probes, no cross joins).
  */
object TemporalJoins {

  /** As-of join: for every left row, the LATEST right row with
    * `right.ts <= left.ts` in the same key group (left-outer: misses give
    * nulls).
    *
    * Formulation: union both sides tagged `side` (right=0 before left=1 on
    * ties, giving the `<=` semantics), then one window pass per key
    * carrying the last non-null right payload forward. ONE shuffle by key
    * and a linear scan — the scalable shape; a naive inequality join would
    * be a per-row range probe, and Spark would plan a broadcast
    * nested-loop.
    *
    * Caller contract: `right` has at most one row per (key, ts) —
    * pre-aggregate it (that also makes results deterministic); both `ts`
    * columns are the same orderable type.
    *
    * Output: all left columns, plus each right column (ts and payloads)
    * prefixed with `prefix`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, prefix: String = "asof_"): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq.filter(_ != keyCol)
    val r2 = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"), lit(0).as("__side"),
      struct(rCols.map(col): _*).as("__r"))
    val l2 = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"), lit(1).as("__side"),
      lit(null).cast(r2.schema("__r").dataType).as("__r"),
      struct(lCols.map(col): _*).as("__l"))
    val u = l2.unionByName(r2.withColumn("__l",
      lit(null).cast(l2.schema("__l").dataType)))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(c => col(s"__l.$c").as(c)) ++
        rCols.map(c => col(s"__asof.$c").as(s"$prefix$c")): _*)
  }

  /** Two-frame range join: every (left, right) pair in the same key group
    * with `right.secs` in `[left.secs - maxBefore, left.secs + maxAfter]`
    * (e.g. "errors in the minute before each click"). Same gap-bucket +
    * union-tag formulation as `rangeSelfJoinPairs`: each input is scanned
    * once, both join roles read ONE shared Exchange, and the plan is an
    * equi-join + residual — never an inequality/nested-loop join. The
    * streaming counterpart is `EventStreams.streamingIntervalJoin` (the
    * native stream-stream join, whose watermarks bound the buffered
    * state instead of the bucket trick).
    *
    * Output: (keyCol, id_l, secs_l, id_r, secs_r).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
                idCol: String, secsCol: String,
                maxBefore: Long, maxAfter: Long): DataFrame = {
    require(maxBefore >= 0 && maxAfter >= 0 && maxBefore + maxAfter > 0,
      "window must be non-negative and non-empty")
    val g = math.max(math.max(maxBefore, maxAfter), 1L)
    def tag(df: DataFrame, side: Int): DataFrame = {
      val bucket = floor(col(secsCol) / g)
      val buckets =
        if (side == 0) array(bucket)
        else array(bucket - 1, bucket, bucket + 1)
      df.select(col(keyCol).as("__k"), col(idCol).as("__id"),
        col(secsCol).as("__s"), lit(side).as("__side"),
        explode(buckets).as("__b"))
    }
    val tagged = tag(left, 0).unionByName(tag(right, 1))
      .repartition(col("__k"), col("__b"))
    tagged.as("a")
      .join(tagged.as("b"),
        col("a.__k") === col("b.__k") && col("a.__b") === col("b.__b") &&
          col("a.__side") < col("b.__side") &&
          col("b.__s").between(col("a.__s") - maxBefore,
            col("a.__s") + maxAfter))
      .select(col("a.__k").as(keyCol),
        col("a.__id").as("id_l"), col("a.__s").as("secs_l"),
        col("b.__id").as("id_r"), col("b.__s").as("secs_r"))
  }

  /** Range self-join: unordered pairs of rows in the same key group whose
    * numeric `secsCol` values are within `maxGap` of each other
    * (`idCol`-ordered, `id_a < id_b`; `gap` is signed `b - a`).
    *
    * Formulation: bucket by `floor(secs / maxGap)`; a "left-role" copy of
    * each row sits in its own bucket, a "right-role" copy explodes into
    * buckets {b-1, b, b+1}, so every qualifying pair meets on EXACTLY one
    * equi-join key (the left row's bucket) — an equi-join + residual,
    * never an inequality join. Shuffle key is (key, bucket): time-skew
    * spreads across buckets.
    *
    * Both roles are exploded out of ONE tagged frame that is explicitly
    * repartitioned on the join key, so the self-join's two sides share an
    * identical Exchange: the scan (and any expression chain feeding
    * `secsCol`) runs once and the shuffle is read twice (ReusedExchange).
    * The role asymmetry lives in the JOIN CONDITION (`a.side < b.side`,
    * which references both sides and therefore cannot be pushed down into
    * either) — side filters above the repartition would be pushed through
    * it and split the exchange back into two.
    */
  def rangeSelfJoinPairs(rows: DataFrame, keyCol: String, idCol: String,
                         secsCol: String, maxGap: Long): DataFrame = {
    require(maxGap > 0, "maxGap must be positive")
    val bucket = floor(col(secsCol) / maxGap)
    val tagged = rows
      .select(col(keyCol).as("__k"), col(idCol).as("__id"),
        col(secsCol).as("__s"), bucket.as("__b0"))
      .select(col("__k"), col("__id"), col("__s"),
        explode(array(
          struct(lit(0).as("side"), col("__b0").as("b")),
          struct(lit(1).as("side"), (col("__b0") - 1).as("b")),
          struct(lit(1).as("side"), col("__b0").as("b")),
          struct(lit(1).as("side"), (col("__b0") + 1).as("b")))).as("__e"))
      .select(col("__k"), col("__id"), col("__s"),
        col("__e.side").as("__side"), col("__e.b").as("__b"))
      .repartition(col("__k"), col("__b"))
    tagged.as("a")
      .join(tagged.as("b"),
        col("a.__k") === col("b.__k") && col("a.__b") === col("b.__b") &&
          col("a.__side") < col("b.__side") &&
          col("a.__id") < col("b.__id") &&
          abs(col("b.__s") - col("a.__s")) <= maxGap)
      .select(col("a.__k").as(keyCol), col("a.__id").as("id_a"),
        col("b.__id").as("id_b"), (col("b.__s") - col("a.__s")).as("gap"))
  }
}
