package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learning-to-rank over the [[Retrieval.ltrFeatures]] table — the
  * loop that turns the scorer stack into a TRAINED ranker and back:
  * features → pointwise logistic training → linear re-scoring →
  * [[IrEval]] quality delta vs the base ranker. The model is a
  * handful of named doubles (driver-sized by design, the
  * [[QualityLr]] parameter-server split over NUMERIC feature columns
  * instead of hashed tokens): training broadcasts it into each pass
  * as literals, application is ONE projection over the feature table
  * — no join, no shuffle, nothing corpus-shaped beyond the feature
  * assembly that was already paid.
  *
  * Reference behavior: jaccard-mapreduce has no ranker; this is part
  * of the demanded training-data-pipeline extension surface
  * (`DocumentSimilarityDriver.java:20-94` stops at similarity).
  */
object Ltr {

  /** Named linear model: `(featureCol → weight)` in a FIXED order +
    * intercept. The order is part of the model — [[ltrScore]]'s sum
    * associates left-to-right over it, so scores replay bitwise from
    * the pinned `(name, weight)` list alone (q228 gates exactly
    * that).
    */
  case class LtrModel(weights: Seq[(String, Double)], bias: Double)

  /** The linear score expression `bias + Σ w_f · x_f`, associated
    * left-to-right in the model's weight order — one per-row
    * arithmetic tree, partitioning-independent by construction (no
    * aggregation anywhere), replayable verbatim in SQL.
    */
  private def scoreExpr(m: LtrModel): Column =
    m.weights.foldLeft(lit(m.bias)) { case (acc, (f, w)) =>
      acc + lit(w) * col(f)
    }

  /** Apply a (trained or pinned) linear model to a feature table:
    * `(queryId, docId, score)` — ONE projection over
    * [[Retrieval.ltrFeatures]]' output, rankable by
    * [[Retrieval.bm25TopK]]. Feature columns must exist and be
    * non-null (the ltrFeatures contract — every emitted pair carries
    * every feature).
    */
  def ltrScore(features: DataFrame, m: LtrModel): DataFrame =
    features.select(col("queryId"), col("docId"),
      scoreExpr(m).as("score"))

  /** [[ltrScore]] + the per-query rank window: the re-ranked run
    * `(queryId, docId, score, rank)`, top `k`, score desc with docId
    * ties — [[Retrieval.bm25TopK]]'s shape, so the output feeds
    * [[IrEval.rankingMetrics]]/[[IrEval.pairedComparison]] directly.
    */
  def ltrRerank(features: DataFrame, m: LtrModel, k: Int): DataFrame =
    Retrieval.bm25TopK(ltrScore(features, m), k)

  /** Sorted left fold keyed by (queryId, docId) — the
    * bit-reproducible gradient reduction (QualityLr's orderedFold
    * over the pair key), so trained weights are identical at any
    * partitioning and the training spec replays deterministically.
    */
  private def pairFold(value: Column): Column =
    aggregate(
      transform(sort_array(collect_list(struct(col("queryId"),
        col("docId"), value.as("__v")))), s => s.getField("__v")),
      lit(0.0), (acc, x) => acc + x)

  /** Pointwise logistic training over a labeled feature table —
    * batch gradient descent, `iters` passes, each ONE distributed
    * aggregate reducing to |features|+1 doubles on the driver (the
    * [[QualityLr.train]] shape over named numeric columns).
    * `labeled` carries `featureCols` plus a {0,1} `labelCol`
    * (relevant or not — graded qrels binarize at the caller's
    * threshold); it is consumed once per iteration plus two setup
    * passes — materialize it (the training-table convention;
    * ltrFeatures output joined to qrels, absent pairs labeled 0).
    *
    * Features STANDARDIZE internally (per-column mean/std over the
    * training table — mixed scales like dl ~ 10² vs coverage ≤ 1
    * would otherwise hand the gradient to whichever column is
    * largest), and the standardization FOLDS INTO the returned
    * model: `w_f/σ_f` with the means rolled into the bias — so
    * [[ltrScore]] applies the returned model to RAW features and the
    * pinned-weights gate stays one projection. Zero-variance
    * features drop (weight 0 — no signal). All reductions are
    * pair-key-sorted folds; update `w ← w − lr·∇/n`, weights start
    * at zero like QualityLr.
    */
  def ltrTrainPointwise(labeled: DataFrame, featureCols: Seq[String],
                        labelCol: String, iters: Int,
                        lr: Double): LtrModel = {
    require(featureCols.nonEmpty, "featureCols must be non-empty")
    require(iters >= 1 && lr > 0, s"iters=$iters lr=$lr")
    val n = labeled.count().toDouble
    require(n > 0, "ltrTrainPointwise: empty training table")
    // per-column mean and (population) std, pair-key-sorted folds
    val meanRow = labeled.groupBy().agg(
      pairFold(col(featureCols.head)).as(featureCols.head),
      featureCols.tail.map(f => pairFold(col(f)).as(f)): _*)
      .collect()(0)
    val means = featureCols.map(f =>
      f -> meanRow.getDouble(meanRow.fieldIndex(f)) / n).toMap
    val varRow = labeled.groupBy().agg(
      pairFold((col(featureCols.head) - lit(means(featureCols.head))) *
        (col(featureCols.head) - lit(means(featureCols.head))))
        .as(featureCols.head),
      featureCols.tail.map(f =>
        pairFold((col(f) - lit(means(f))) * (col(f) - lit(means(f))))
          .as(f)): _*)
      .collect()(0)
    val stds = featureCols.map(f =>
      f -> math.sqrt(varRow.getDouble(varRow.fieldIndex(f)) / n)).toMap
    val live = featureCols.filter(stds(_) > 0)
    var w = live.map(_ => 0.0).toArray
    var b = 0.0
    for (_ <- 1 to iters) {
      // standardized score under the current weights, then one
      // aggregate carrying every feature's gradient + the bias grad
      val z = live.zipWithIndex.foldLeft(lit(b)) { case (acc, (f, i)) =>
        acc + lit(w(i)) * (col(f) - lit(means(f))) / lit(stds(f))
      }
      val withR = labeled.select((col("queryId") +: col("docId") +:
        (lit(1.0) / (lit(1.0) + exp(-z)) - col(labelCol).cast("double"))
          .as("__r") +: live.map(col)): _*)
      val gRow = withR.groupBy().agg(
        pairFold(col("__r")).as("__gb"),
        live.map(f => pairFold(
          (col(f) - lit(means(f))) / lit(stds(f)) * col("__r")).as(f)): _*)
        .collect()(0)
      b -= lr * gRow.getDouble(gRow.fieldIndex("__gb")) / n
      w = live.zipWithIndex.map { case (f, i) =>
        w(i) - lr * gRow.getDouble(gRow.fieldIndex(f)) / n
      }.toArray
    }
    // fold the standardization into raw-feature weights:
    //   Σ wᵢ(x−μ)/σ + b  =  Σ (wᵢ/σ)x + (b − Σ wᵢμ/σ)
    val raw = live.zipWithIndex.map { case (f, i) => f -> w(i) / stds(f) }
    val bias = b - live.zipWithIndex
      .map { case (f, i) => w(i) * means(f) / stds(f) }.sum
    LtrModel(featureCols.map(f =>
      f -> raw.toMap.getOrElse(f, 0.0)), bias)
  }
}
