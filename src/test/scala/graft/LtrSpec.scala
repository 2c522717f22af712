package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IrEval, Ltr, Retrieval}

/** [[graft.operators.Ltr]] — the full learning-to-rank loop:
  * features → pointwise training → linear re-rank → IrEval delta.
  * The APPLICATION contract (pinned weights, one projection) is
  * oracle-gated by q228; this spec owns the iterative training side.
  */
class LtrSpec extends SparkSpec {
  import spark.implicits._

  // seeded corpus with a planted relevance signal: docs sharing the
  // query's RARE terms are relevant, a hot stopword-ish term is
  // everywhere (so ranking by raw match count alone is weak)
  private def fixture(): (DataFrame, DataFrame, DataFrame, DataFrame,
    DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(228)
    val c = (1L to 80L).map { id =>
      id -> (Seq.fill(6 + rnd.nextInt(6))(
        s"tok${30 / (rnd.nextInt(30) + 1)}") :+ "common").mkString(" ")
    }.toDF("doc_id", "text")
    val qs = (200L to 211L).map { id =>
      id -> (Seq.fill(2)(s"tok${30 / (rnd.nextInt(30) + 1)}") ++
        Seq.fill(2)(s"tok${10 + rnd.nextInt(21)}") :+ "common")
        .mkString(" ")
    }.toDF("query_id", "text")
    val tf = Retrieval.termFrequencies(c, "doc_id", "text")
      .localCheckpoint()
    val dfT = Retrieval.dfTable(tf).localCheckpoint()
    val cfT = Retrieval.cfTable(tf).localCheckpoint()
    val st = Retrieval.corpusStats(tf).localCheckpoint()
    val feats = Retrieval.ltrFeatures(tf, dfT, cfT, st, qs,
      "query_id", "text").localCheckpoint()
    // qrels: the exact BM25 top-3 is "relevant" — the planted truth
    // the ranker should learn to approximate from the feature columns
    val qrels = Retrieval.bm25TopK(
      Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
        "query_id", "text"), 3)
      .select(col("queryId"), col("docId"), lit(1.0).as("grade"))
      .localCheckpoint()
    (tf, dfT, st, qs, feats, qrels)
  }

  private val FeatureCols =
    Seq("bm25", "ql", "n_matched", "coverage", "dl", "sum_idf")

  test("pointwise training is deterministic and learns the planted signal") {
    val (_, _, _, _, feats, qrels) = fixture()
    val labeled = feats
      .join(qrels.select(col("queryId"), col("docId"),
        lit(1.0).as("label")), Seq("queryId", "docId"), "left_outer")
      .na.fill(0.0, Seq("label"))
      .localCheckpoint() // consumed once per iteration
    def trained() = Ltr.ltrTrainPointwise(labeled, FeatureCols,
      "label", iters = 30, lr = 0.5)
    val m1 = trained()
    val m2 = trained()
    assert(m1 === m2, "training must be bit-deterministic") // bitwise
    // the planted relevance IS high-bm25, so the learned bm25 weight
    // must be positive and the model must separate the classes: mean
    // score of labeled-relevant pairs above labeled-irrelevant
    val wm = m1.weights.toMap
    assert(wm("bm25") > 0, s"bm25 weight not positive: $m1")
    val scored = Ltr.ltrScore(feats, m1)
      .join(labeled.select("queryId", "docId", "label"),
        Seq("queryId", "docId"))
    val Array(posMean, negMean) = scored
      .groupBy(col("label")).agg(avg(col("score")).as("m"))
      .orderBy(col("label").desc).collect().map(_.getDouble(1))
    assert(posMean > negMean,
      s"trained model does not separate: pos=$posMean neg=$negMean")
  }

  test("the trained re-ranker beats a weak baseline through IrEval") {
    val (tf, dfT, st, qs, feats, qrels) = fixture()
    val labeled = feats
      .join(qrels.select(col("queryId"), col("docId"),
        lit(1.0).as("label")), Seq("queryId", "docId"), "left_outer")
      .na.fill(0.0, Seq("label"))
      .localCheckpoint()
    val m = Ltr.ltrTrainPointwise(labeled, FeatureCols,
      "label", iters = 30, lr = 0.5)
    val ltrRun = Ltr.ltrRerank(feats, m, 3)
      .select("queryId", "docId", "rank").localCheckpoint()
    // weak baseline: rank by raw match count (n_matched desc) — the
    // hot planted term makes match count a poor relevance proxy
    val weakRun = Retrieval.bm25TopK(feats.select(col("queryId"),
      col("docId"), col("n_matched").cast("double").as("score")), 3)
      .select("queryId", "docId", "rank").localCheckpoint()
    val ltrM = IrEval.rankingMetrics(ltrRun, qrels, k = 3)
      .localCheckpoint()
    val weakM = IrEval.rankingMetrics(weakRun, qrels, k = 3)
      .localCheckpoint()
    val cmp = IrEval.pairedComparison(ltrM, weakM).collect()(0)
    val dNdcg = cmp.getDouble(cmp.fieldIndex("d_ndcg"))
    assert(cmp.getLong(cmp.fieldIndex("n_queries")) === 12L)
    assert(dNdcg > 0,
      s"LTR must beat the match-count baseline on nDCG: $dNdcg")
    // ...and approximates its training signal: mean RR close to 1
    val mm = IrEval.meanRankingMetrics(ltrM).collect()(0)
    assert(mm.getDouble(mm.fieldIndex("mrr")) > 0.8,
      s"LTR failed to learn the planted top-3: $mm")
  }

  test("proximity-augmented features train and re-rank end to end") {
    // the task-8 composition: ltrFeatures LEFT-joined with
    // proximityFeatures (NULL = no signal -> coalesced defaults),
    // the extended column set through training and application —
    // the proximity columns ride the same loop as the lexical ones
    val rnd = new scala.util.Random(230)
    val c = (1L to 60L).map { id =>
      id -> (Seq.fill(8 + rnd.nextInt(5))(
        s"tok${20 / (rnd.nextInt(20) + 1)}")).mkString(" ")
    }.toDF("doc_id", "text")
    val qs = (300L to 307L).map { id =>
      id -> Seq.fill(3)(s"tok${20 / (rnd.nextInt(20) + 1)}").mkString(" ")
    }.toDF("query_id", "text")
    val tf = Retrieval.termFrequencies(c, "doc_id", "text")
      .localCheckpoint()
    val dfT = Retrieval.dfTable(tf).localCheckpoint()
    val cfT = Retrieval.cfTable(tf).localCheckpoint()
    val st = Retrieval.corpusStats(tf).localCheckpoint()
    val posts = Retrieval.positionalPostings(c, "doc_id", "text")
      .localCheckpoint()
    val prox = Retrieval.proximityFeatures(posts, qs, "query_id", "text")
    val feats = Retrieval.ltrFeatures(tf, dfT, cfT, st, qs,
      "query_id", "text")
      .join(prox, Seq("queryId", "docId"), "left_outer")
      .select(col("queryId"), col("docId"), col("bm25"), col("ql"),
        col("n_matched"), col("coverage"), col("dl"), col("sum_idf"),
        coalesce(col("min_dist"), lit(1000L)).as("min_dist"),
        coalesce(col("n_gaps"), lit(0L)).as("n_gaps"))
      .localCheckpoint()
    val qrels = Retrieval.bm25TopK(
      Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
        "query_id", "text"), 3)
      .select(col("queryId"), col("docId"), lit(1.0).as("label"))
      .localCheckpoint()
    val labeled = feats
      .join(qrels, Seq("queryId", "docId"), "left_outer")
      .na.fill(0.0, Seq("label")).localCheckpoint()
    val cols = FeatureCols ++ Seq("min_dist", "n_gaps")
    def trained() = Ltr.ltrTrainPointwise(labeled, cols, "label",
      iters = 20, lr = 0.5)
    val m = trained()
    assert(m === trained()) // bit-deterministic with the extra columns
    assert(m.weights.map(_._1) === cols)
    val run = Ltr.ltrRerank(feats, m, 3)
    assert(run.count() > 0)
    assert(run.groupBy("queryId").count().collect()
      .forall(_.getLong(1) <= 3))
  }

  test("zero-variance features drop with weight zero") {
    val (_, _, _, _, feats, qrels) = fixture()
    val labeled = feats
      .withColumn("const", lit(3.5))
      .join(qrels.select(col("queryId"), col("docId"),
        lit(1.0).as("label")), Seq("queryId", "docId"), "left_outer")
      .na.fill(0.0, Seq("label"))
      .localCheckpoint()
    val m = Ltr.ltrTrainPointwise(labeled, FeatureCols :+ "const",
      "label", iters = 3, lr = 0.5)
    assert(m.weights.toMap.apply("const") === 0.0)
    assert(m.weights.map(_._1) === FeatureCols :+ "const",
      "model must keep the declared feature order")
  }

  test("preference pairs emit each label-differing pair once, winner first") {
    val labeled = Seq(
      (1L, 10L, 1.0, 4.0, 100L), (1L, 11L, 0.0, 1.0, 50L),
      (1L, 12L, 0.0, 3.0, 80L), (2L, 10L, 1.0, 2.0, 10L),
      (2L, 13L, 1.0, 5.0, 20L))
      .toDF("queryId", "docId", "label", "f1", "f2")
    val got = Ltr.ltrPreferencePairs(labeled, Seq("f1", "f2"), "label")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSet
    // query 1: doc 10 (label 1) beats 11 and 12; query 2: both docs
    // label 1 -> no pair; winner-minus-loser deltas
    assert(got === Set(
      (1L, "10#11", 3.0, 50L),
      (1L, "10#12", 1.0, 20L)))
  }

  test("pairwise training is deterministic, partitioning-invariant, " +
    "and learns the planted signal") {
    val (_, _, _, _, feats, qrels) = fixture()
    val labeled = feats
      .join(qrels.select(col("queryId"), col("docId"),
        lit(1.0).as("label")), Seq("queryId", "docId"), "left_outer")
      .na.fill(0.0, Seq("label"))
      .localCheckpoint()
    def trained(df: org.apache.spark.sql.DataFrame) =
      Ltr.ltrTrainPairwise(df, FeatureCols, "label",
        iters = 30, lr = 0.5)
    val m1 = trained(labeled.repartition(1))
    val m2 = trained(labeled.repartition(7))
    assert(m1 === m2, "pairwise weights must be partitioning-invariant")
    assert(m1.bias === 0.0, "the pairwise margin has no intercept")
    assert(m1.weights.map(_._1) === FeatureCols)
    // the planted relevance IS high-bm25
    assert(m1.weights.toMap.apply("bm25") > 0, s"$m1")
    // ...and the trained ranker recovers it: mean RR near 1
    val run = Ltr.ltrRerank(feats, m1, 3)
      .select("queryId", "docId", "rank").localCheckpoint()
    val mm = IrEval.meanRankingMetrics(
      IrEval.rankingMetrics(run, qrels, k = 3)).collect()(0)
    assert(mm.getDouble(mm.fieldIndex("mrr")) > 0.8, s"$mm")
  }

  test("pairwise vs pointwise through the IrEval paired t-test " +
    "(the q218 convention)") {
    val (_, _, _, _, feats, qrels) = fixture()
    val labeled = feats
      .join(qrels.select(col("queryId"), col("docId"),
        lit(1.0).as("label")), Seq("queryId", "docId"), "left_outer")
      .na.fill(0.0, Seq("label"))
      .localCheckpoint()
    val mPair = Ltr.ltrTrainPairwise(labeled, FeatureCols, "label",
      iters = 200, lr = 1.0)
    val mPoint = Ltr.ltrTrainPointwise(labeled, FeatureCols, "label",
      iters = 30, lr = 0.5)
    val runPair = IrEval.rankingMetrics(
      Ltr.ltrRerank(feats, mPair, 3).select("queryId", "docId", "rank"),
      qrels, k = 3).localCheckpoint()
    val runPoint = IrEval.rankingMetrics(
      Ltr.ltrRerank(feats, mPoint, 3).select("queryId", "docId", "rank"),
      qrels, k = 3).localCheckpoint()
    // the paired t-test vs pointwise is the MEASUREMENT (the fixture's
    // labels are literally a pointwise-classifiable feature's top-k,
    // so neither objective dominates by construction — on graded
    // real qrels the pairwise objective is where nDCG moves)
    val cmp = IrEval.pairedComparison(runPair, runPoint).collect()(0)
    assert(cmp.getLong(cmp.fieldIndex("n_queries")) === 12L)
    assert(!cmp.getDouble(cmp.fieldIndex("d_ndcg")).isNaN)
    // the QUALITY claim mirrors the pointwise test: the pairwise
    // ranker must beat the weak match-count baseline on nDCG
    val weakRun = Retrieval.bm25TopK(feats.select(col("queryId"),
      col("docId"), col("n_matched").cast("double").as("score")), 3)
      .select("queryId", "docId", "rank").localCheckpoint()
    val weakM = IrEval.rankingMetrics(weakRun, qrels, k = 3)
      .localCheckpoint()
    val vsWeak = IrEval.pairedComparison(runPair, weakM).collect()(0)
    val dNdcg = vsWeak.getDouble(vsWeak.fieldIndex("d_ndcg"))
    assert(dNdcg > 0,
      s"pairwise must beat the match-count baseline on nDCG: $dNdcg")
  }
}
