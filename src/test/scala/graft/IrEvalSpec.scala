package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IrEval

/** [[graft.operators.IrEval]] — trec_eval semantics on hand-checkable
  * fixtures: the metric arithmetic, the judged-universe convention,
  * cutoff behavior, and the defensive input collapses.
  */
class IrEvalSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, Long, Int)*): DataFrame =
    rows.toDF("queryId", "docId", "rank")

  private def qrels(rows: (Long, Long, Int)*): DataFrame =
    rows.toDF("queryId", "docId", "grade")

  private def metrics(r: DataFrame, q: DataFrame, k: Int)
      : Map[Long, (Long, Long, Double, Double, Double, Double, Double)] =
    IrEval.rankingMetrics(r, q, k).collect().map { row =>
      row.getLong(0) -> ((row.getLong(1), row.getLong(2), row.getDouble(3),
        row.getDouble(4), row.getDouble(5), row.getDouble(6),
        row.getDouble(7)))
    }.toMap

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  test("metrics match the hand-derived trec_eval numbers") {
    // query 1: judged docs 10(g3) 11(g2) 12(g1); run returns
    // 10@1 (rel), 99@2 (unjudged), 11@3 (rel), 98@4, 97@5
    val m = metrics(
      run((1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3), (1L, 98L, 4),
        (1L, 97L, 5)),
      qrels((1L, 10L, 3), (1L, 11L, 2), (1L, 12L, 1)), k = 5)
    val (nRel, nRetRel, p, rec, rr, ap, ndcg) = m(1L)
    assert(nRel === 3L && nRetRel === 2L)
    assert(p === 2.0 / 5.0)
    assert(rec === 2.0 / 3.0)
    assert(rr === 1.0)
    // AP: rel hits at ranks 1 (prec 1/1) and 3 (prec 2/3), / n_rel
    assert(math.abs(ap - (1.0 + 2.0 / 3.0) / 3.0) < 1e-12)
    val dcg = (math.pow(2, 3) - 1) / log2(2.0) +
      (math.pow(2, 2) - 1) / log2(4.0)
    val idcg = (math.pow(2, 3) - 1) / log2(2.0) +
      (math.pow(2, 2) - 1) / log2(3.0) +
      (math.pow(2, 1) - 1) / log2(4.0)
    assert(math.abs(ndcg - dcg / idcg) < 1e-12)
  }

  test("an ideally-ordered run scores ndcg = 1 and ap = 1") {
    val m = metrics(
      run((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)),
      qrels((1L, 10L, 3), (1L, 11L, 2), (1L, 12L, 1)), k = 3)
    val (_, _, _, rec, rr, ap, ndcg) = m(1L)
    assert(rec === 1.0 && rr === 1.0)
    assert(math.abs(ap - 1.0) < 1e-12)
    assert(math.abs(ndcg - 1.0) < 1e-12)
  }

  test("judged queries missing from the run score zero, run-only drop") {
    val m = metrics(
      run((2L, 50L, 1)), // query 2 unjudged -> dropped
      qrels((1L, 10L, 1)), k = 5)
    assert(m.keySet === Set(1L))
    assert(m(1L) === ((1L, 0L, 0.0, 0.0, 0.0, 0.0, 0.0)))
  }

  test("the cutoff ignores hits beyond k on both sides") {
    // rel doc at rank 6 is outside k = 5: no credit anywhere; IDCG
    // also truncates at k (4 judged docs, k = 3 ideal positions)
    val m = metrics(
      run((1L, 10L, 1), (1L, 11L, 6)),
      qrels((1L, 10L, 2), (1L, 11L, 2), (1L, 12L, 1), (1L, 13L, 1)),
      k = 3)
    val (_, nRetRel, p, rec, _, ap, ndcg) = m(1L)
    assert(nRetRel === 1L)
    assert(p === 1.0 / 3.0 && rec === 1.0 / 4.0)
    assert(math.abs(ap - (1.0 / 4.0)) < 1e-12)
    val dcg = (math.pow(2, 2) - 1) / log2(2.0)
    val idcg = (math.pow(2, 2) - 1) / log2(2.0) +
      (math.pow(2, 2) - 1) / log2(3.0) +
      (math.pow(2, 1) - 1) / log2(4.0)
    assert(math.abs(ndcg - dcg / idcg) < 1e-12)
  }

  test("duplicate run rows collapse to min rank; grade-0 qrels ignored") {
    val m = metrics(
      run((1L, 10L, 4), (1L, 10L, 2), (1L, 11L, 1)),
      qrels((1L, 10L, 1), (1L, 11L, 0), (1L, 12L, 1)), k = 5)
    val (nRel, nRetRel, _, _, rr, _, _) = m(1L)
    assert(nRel === 2L) // the grade-0 judgment is not relevant
    assert(nRetRel === 1L)
    assert(rr === 0.5) // doc 10 at its min rank 2; doc 11 irrelevant
  }

  test("duplicate qrels rows collapse to max grade") {
    // a merged judgment file repeating (1, 10): n_rel must stay 1,
    // and the kept grade is the max (2), which changes IDCG
    val m = metrics(
      run((1L, 10L, 1)),
      qrels((1L, 10L, 1), (1L, 10L, 2)), k = 3)
    val (nRel, nRetRel, _, rec, _, ap, ndcg) = m(1L)
    assert(nRel === 1L && nRetRel === 1L && rec === 1.0)
    assert(math.abs(ap - 1.0) < 1e-12)
    assert(math.abs(ndcg - 1.0) < 1e-12) // one doc, ideal trivially
  }

  test("empty metrics produce an empty mean table, not NaNs") {
    val per = IrEval.rankingMetrics(
      run((1L, 10L, 1)),
      qrels((2L, 20L, 0)), k = 5) // no relevant judgment anywhere
    assert(per.count() === 0L)
    assert(IrEval.meanRankingMetrics(per).count() === 0L)
  }

  test("paired comparison matches the hand-computed t-statistic") {
    // three common queries with p_at_k diffs 0.2, 0.4, 0.6:
    // mean 0.4, s^2 = (0.04 + 0 + 0.04) / 2 = 0.04, t = 0.4 /
    // sqrt(0.04 / 3) = 3.4641...
    def m(rows: (Long, Double)*): DataFrame =
      rows.map { case (q, p) => (q, 1L, 1L, p, p, p, p, p) }
        .toDF("queryId", "n_rel", "n_ret_rel", "p_at_k", "recall_at_k",
          "rr", "ap", "ndcg")
    val a = m((1L, 0.8), (2L, 0.9), (3L, 1.0))
    val b = m((1L, 0.6), (2L, 0.5), (3L, 0.4), (9L, 0.1)) // 9 unpaired
    val r = IrEval.pairedComparison(a, b).collect().head
    assert(r.getLong(0) === 3L)
    assert(math.abs(r.getDouble(1) - 0.4) < 1e-12) // d_p_at_k
    assert(math.abs(r.getDouble(2) - 0.4 / math.sqrt(0.04 / 3)) < 1e-9)
  }

  test("paired comparison of identical runs has zero deltas, null t") {
    def m(rows: (Long, Double)*): DataFrame =
      rows.map { case (q, p) => (q, 1L, 1L, p, p, p, p, p) }
        .toDF("queryId", "n_rel", "n_ret_rel", "p_at_k", "recall_at_k",
          "rr", "ap", "ndcg")
    val a = m((1L, 0.8), (2L, 0.5))
    val r = IrEval.pairedComparison(a, a).collect().head
    assert(r.getLong(0) === 2L)
    assert(r.getDouble(1) === 0.0 && r.isNullAt(2))
    // disjoint query sets -> empty output, not a NaN row
    val c = m((7L, 0.3))
    assert(IrEval.pairedComparison(a, c).count() === 0L)
  }

  test("Kendall tau: identical, reversed, partial, and disjoint runs") {
    def r(rows: (Long, Long, Int)*): DataFrame =
      rows.toDF("queryId", "docId", "rank")
    val a = r((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2),
      (3L, 30L, 1),
      (4L, 40L, 1), (4L, 41L, 2))
    // query 1 reversed; query 2 identical; query 3 fully disjoint;
    // query 4 shares exactly one doc
    val b = r((1L, 12L, 1), (1L, 11L, 2), (1L, 10L, 3),
      (2L, 20L, 1), (2L, 21L, 2),
      (3L, 99L, 1),
      (4L, 40L, 1), (4L, 98L, 2))
    val got = IrEval.kendallTau(a, b).collect()
      .map(row => row.getLong(0) -> ((row.getLong(1), row.getLong(2),
        row.getLong(3),
        if (row.isNullAt(4)) None else Some(row.getDouble(4))))).toMap
    assert(got(1L) === ((3L, 0L, 3L, Some(-1.0))))
    assert(got(2L) === ((2L, 1L, 0L, Some(1.0))))
    assert(got(3L) === ((0L, 0L, 0L, None))) // nothing shared
    assert(got(4L) === ((1L, 0L, 0L, None))) // 1 common doc: undefined
    // tau against a hand-computed mixed ordering: a = 1,2,3,4 vs
    // b = 2,1,3,4 -> one discordant pair of six, tau = 4/6
    val c1 = r((9L, 1L, 1), (9L, 2L, 2), (9L, 3L, 3), (9L, 4L, 4))
    val c2 = r((9L, 1L, 2), (9L, 2L, 1), (9L, 3L, 3), (9L, 4L, 4))
    val t = IrEval.kendallTau(c1, c2).collect().head
    assert(t.getLong(1) === 4L && t.getLong(2) === 5L &&
      t.getLong(3) === 1L)
    assert(math.abs(t.getDouble(4) - 4.0 / 6.0) < 1e-12)
  }

  test("paired comparison collapses duplicated queryIds before pairing") {
    def m(rows: (Long, Double)*): DataFrame =
      rows.map { case (q, p) => (q, 1L, 1L, p, p, p, p, p) }
        .toDF("queryId", "n_rel", "n_ret_rel", "p_at_k", "recall_at_k",
          "rr", "ap", "ndcg")
    // query 1 appears twice in A (a unioned batch): the join must not
    // fan out — n stays 2 and the t-statistic matches the clean input
    val dup = m((1L, 0.8), (1L, 0.8), (2L, 0.9))
    val clean = m((1L, 0.8), (2L, 0.9))
    val b = m((1L, 0.5), (2L, 0.4))
    val viaDup = IrEval.pairedComparison(dup, b).collect().head
    val viaClean = IrEval.pairedComparison(clean, b).collect().head
    assert(viaDup.getLong(0) === 2L)
    for (i <- 1 to 10)
      assert((viaDup.isNullAt(i) && viaClean.isNullAt(i)) ||
        viaDup.getDouble(i) === viaClean.getDouble(i), s"col $i")
  }

  test("macro means average every query equally") {
    val per = IrEval.rankingMetrics(
      run((1L, 10L, 1), (2L, 99L, 1)),
      qrels((1L, 10L, 1), (2L, 20L, 1)), k = 1)
    val m = IrEval.meanRankingMetrics(per).collect().head
    assert(m.getLong(0) === 2L)
    // query 1 is perfect, query 2 scores zero on every metric
    for (i <- 1 to 5)
      assert(math.abs(m.getDouble(i) - 0.5) < 1e-12, s"col $i")
  }
}
