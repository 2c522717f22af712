package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator

/** Per-key top-k without sorting whole partitions — see
  * `TopKAggregator` for why this beats the window formulation at scale.
  */
object TopK {

  /** For each distinct `keyCols` group, the k rows with the largest
    * `ordCol` (ties broken by `idCol` ascending), emitted as
    * `(keyCols..., rank, ordCol, idCol)` with rank 1 = best. `idCol`
    * must be unique per row for the result to be a pure function of the
    * input set. Rows with a null `ordCol` or `idCol` are excluded up
    * front: the aggregator's primitive input encoder would otherwise
    * abort the job on the first null, and a null can never rank anyway.
    * One shuffle, aggregated map-side to <=k entries per
    * (partition, key) — the window-function formulation of the same
    * query shuffles and sorts every input row.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], ordCol: String,
             idCol: String, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k))
    df.filter(col(ordCol).isNotNull && col(idCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(topk(col(ordCol).cast("double"), col(idCol).cast("long"))
        .as("__top"))
      .select(keyCols.map(col) :+ posexplode(col("__top")): _*)
      .select(keyCols.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("col._1").as(ordCol),
        col("col._2").as(idCol)): _*)
  }
}
