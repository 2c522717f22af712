package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityLr

/** Hashed-feature logistic regression (quality classifier). */
class QualityLrSpec extends SparkSpec {
  import spark.implicits._

  // separable toy corpus: positives share "excellent", negatives "spam"
  private def toyDf = Seq(
    (1L, "excellent prose with careful structure", 1.0),
    (2L, "excellent reasoning and clear citations", 1.0),
    (3L, "spam spam buy now cheap", 0.0),
    (4L, "cheap spam offer click here", 0.0)
  ).toDF("doc_id", "text", "y")

  test("features are L1-normalized hashed term frequencies") {
    val feats = QualityLr.hashedFeatures(
      Seq((1L, "a a b", 1.0)).toDF("doc_id", "text", "y"),
      "doc_id", "text", col("y"), dim = 8)
      .collect().map(r => r.getInt(2) -> r.getDouble(3)).toMap
    // 3 tokens: "a"×2, "b"×1 → x-values {2/3, 1/3} over ≤2 buckets,
    // summing to 1 (L1)
    assert(math.abs(feats.values.sum - 1.0) < 1e-15)
    assert(feats.values.toSeq.sorted == Seq(1.0 / 3, 2.0 / 3) ||
      feats.values.toSeq == Seq(1.0)) // both tokens could share a bucket
  }

  test("docs with no alphanumeric text are excluded") {
    val feats = QualityLr.hashedFeatures(
      Seq((1L, "real words", 1.0), (2L, "!!! ...", 0.0))
        .toDF("doc_id", "text", "y"),
      "doc_id", "text", col("y"), dim = 8)
    assert(feats.select("__id").distinct().as[Long].collect().toSet
      == Set(1L))
  }

  test("gradient at the zero model is x·(0.5 − y) folded per bucket") {
    val feats = QualityLr.hashedFeatures(toyDf, "doc_id", "text",
      col("y"), dim = 16)
    val grads = QualityLr.gradient(feats,
      QualityLr.LrModel(Array.fill(16)(0.0), 0.0))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val expect = feats
      .select(col("__j"), (col("__x") * (lit(0.5) - col("__y"))).as("t"))
      .groupBy("__j").agg(sum("t"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(grads.keySet == expect.keySet)
    grads.foreach { case (j, g) =>
      assert(math.abs(g - expect(j)) < 1e-12, s"bucket $j: $g vs ${expect(j)}")
    }
  }

  test("training separates a separable corpus") {
    val m = QualityLr.train(toyDf, "doc_id", "text", col("y"),
      dim = 64, iters = 50, lr = 4.0)
    val probs = QualityLr.scores(toyDf, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(probs(1L) > 0.7 && probs(2L) > 0.7, s"positives: $probs")
    assert(probs(3L) < 0.3 && probs(4L) < 0.3, s"negatives: $probs")
  }

  test("trained weights are partitioning-invariant bit-for-bit") {
    def model(parts: Int) = QualityLr.train(
      toyDf.repartition(parts), "doc_id", "text", col("y"),
      dim = 32, iters = 3, lr = 0.5)
    val a = model(1)
    val b = model(7)
    assert(a.bias == b.bias)
    assert(a.weights.toSeq == b.weights.toSeq)
  }

  test("char-ngram LR separates same-script languages the lexicon cannot") {
    // Spanish-like vs Portuguese-like: same script, and every sentence
    // hits the 'es' stopword lexicon ('de'/'que' are in BOTH the es and
    // fr lexicons; ties break lexicographically to 'es') — so the
    // lexicon langId gives ONE answer for both languages and provably
    // cannot separate them. Char-3-gram transition statistics can.
    val es = Seq(
      "el perro ladra mucho en la casa roja que tiene de noche",
      "la noche llega y el agua corre de la montana que vemos",
      "el gato duerme en la silla vieja que esta de lado",
      "la casa roja tiene un perro que ladra de noche")
    val pt = Seq(
      "o cachorro ladra muito na casa vermelha que fica de noite",
      "a noite chega e as aguas correm de longe que vemos",
      "o gato dorme na cadeira velha que fica de lado",
      "a casa vermelha tem um cachorro que ladra de noite")
    val docs = (es.zipWithIndex.map { case (t, i) => (i.toLong, t, 1.0) }
      ++ pt.zipWithIndex.map { case (t, i) => (100L + i, t, 0.0) })
      .toDF("doc_id", "text", "y")
    // the lexicon heuristic: ONE prediction for every doc of BOTH
    // languages — zero separating power on this pair
    val lex = graft.functions.TextAnalysis
      .langId(docs, "doc_id", "text")
      .select("lang_pred").distinct().as[String].collect().toSet
    assert(lex == Set("es"), s"lexicon must collapse both to 'es': $lex")
    // trained char-3-gram LR: clean separation
    val tok = QualityLr.charNgramTokens(3)
    // L1-normalized distinct-ngram features are ~1/40 each, so the
    // margin grows slowly; more iterations at the stable step size
    // (larger steps oscillate and collapse the probabilities)
    val m = QualityLr.train(docs, "doc_id", "text", col("y"),
      dim = 128, iters = 120, lr = 4.0, tokenize = tok)
    val probs = QualityLr.scores(docs, "doc_id", "text", m, tokenize = tok)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every doc on the right side of 0.5, with a real gap between the
    // two languages' score ranges
    val esMin = es.indices.map(i => probs(i.toLong)).min
    val ptMax = pt.indices.map(i => probs(100L + i)).max
    assert(esMin > 0.5 && ptMax < 0.5 && esMin - ptMax > 0.1,
      s"expected clean separation: esMin=$esMin ptMax=$ptMax $probs")
  }

  test("zero model scores exactly 0.5 everywhere") {
    val probs = QualityLr.scores(toyDf, "doc_id", "text",
      QualityLr.LrModel(Array.fill(16)(0.0), 0.0))
      .select("prob").as[Double].collect()
    assert(probs.length == 4 && probs.forall(_ == 0.5))
  }
}
