package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Jaccard

/** Exact-threshold Jaccard join (AllPairs/PPJoin prefix filtering):
  * completeness vs the brute-force [[Jaccard.allPairs]] filter on both
  * hand-built and seeded-random corpora, threshold-boundary inclusion,
  * the float-edge prefix length, and the candidate-stage containment
  * chain (prefix ⊇ positional ⊇ verified).
  */
class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("docId", "text")

  /** Brute-force truth: allPairs filtered at t (double compare matches
    * thresholdJoin's verification compare).
    */
  private def brute(d: DataFrame, t: Double): Set[(Long, Long, Long)] =
    Jaccard.allPairs(d)
      .filter(col("similarity") >= lit(t))
      .select("docA", "docB", "inter")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  private def joined(d: DataFrame, t: Double): Set[(Long, Long, Long)] =
    Jaccard.thresholdJoin(Jaccard.tokenized(d), t)
      .select("docA", "docB", "inter")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("matches brute force on a hand-built corpus at several thresholds") {
    val d = docs(
      1L -> "spark scala join shuffle partition",
      2L -> "spark scala join shuffle broadcast",
      3L -> "spark scala join shuffle partition",   // exact dup of 1
      4L -> "quantum entangled qubits decohere fast",
      5L -> "spark scala join",                      // subset of 1
      6L -> "completely different words here now")
    for (t <- Seq(0.3, 0.5, 0.8, 0.99, 1.0)) {
      assert(joined(d, t) === brute(d, t), s"threshold $t")
    }
  }

  test("pair exactly at the threshold is kept") {
    // |A|=4, |B|=5, inter=4 (A ⊂ B): J = 4/5 = 0.8 exactly
    val d = docs(
      1L -> "alpha beta gamma delta",
      2L -> "alpha beta gamma delta epsilon")
    assert(joined(d, 0.8) === Set((1L, 2L, 4L)))
  }

  test("float-edge prefix length cannot drop a true pair (t*sz an ulp high)") {
    // t=0.8, sz=5: 0.8*5 = 4.000000000000000222 in IEEE double; without
    // the 1e-9 slack ceil() gives 5 and the prefix shrinks to 1 token on
    // BOTH docs — two J=0.8 docs of size 5 sharing 4-of-5 tokens whose
    // single rarest tokens differ would be lost. Construct exactly that:
    // the two non-shared tokens are each df=1 (rarest), so a 1-token
    // prefix would be {zeta} vs {eta} — disjoint.
    val d = docs(
      1L -> "alpha beta gamma delta zeta",
      2L -> "alpha beta gamma delta eta",
      3L -> "alpha beta gamma delta epsilon kappa lambda mu nu xi")
    // J(1,2) = 4/6 = 0.667 — use sizes where J >= t at the edge instead:
    // |A|=|B|=9, inter=9*0.8/... build J = 0.8 with sz 8 and 10:
    val e = docs(
      1L -> "a1 a2 a3 a4 a5 a6 a7 a8",
      2L -> "a1 a2 a3 a4 a5 a6 a7 a8 b1 b2")
    // J = 8/10 = 0.8; prefix of doc1 at t=0.8, sz=8: 8-ceil(6.4)+1 = 2
    assert(joined(e, 0.8) === Set((1L, 2L, 8L)))
    // and the 5-token ulp case at its own true threshold
    assert(joined(d, 0.6) === brute(d, 0.6))
  }

  test("candidate stages form a containment chain and verify exactly") {
    val d = docs(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w11"),
      (3L, "w1 w2 w3 x1 x2 x3 x4 x5 x6 x7"),
      (4L, "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"))
    val toks = Jaccard.tokenized(d)
    val ordered = Jaccard.dfOrderedSets(toks)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("docA", "docB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pre = pairs(Jaccard.prefixCandidates(ordered, 0.8, positional = false))
    val pos = pairs(Jaccard.prefixCandidates(ordered, 0.8, positional = true))
    val ver = joined(d, 0.8).map(x => (x._1, x._2))
    assert(pos.subsetOf(pre))
    assert(ver.subsetOf(pos))
    assert(ver === Set((1L, 2L)))
    // (1,3): sizes equal so length filter passes, but only 3 shared
    // tokens — positional or verification must reject it
    assert(!ver.contains((1L, 3L)))
    // (1,4)/(2,4)/(3,4): zero shared tokens — not even prefix candidates
    assert(!pre.exists(_._2 == 4L))
  }

  test("positional filter prunes a candidate the length filter admits") {
    // Same sizes (length filter passes), one shared token that sits LATE
    // in both df-ordered prefixes is impossible by construction — the
    // shared token's earliest occurrence bounds overlap. Build docs
    // sharing exactly one rare token (df=2, rarest — position 0 in both
    // prefixes): ubound = 1 + min(sz-1, sz-1) = sz, which passes, so use
    // differing rare tails to push the shared token late instead. Two
    // docs of 10 tokens sharing w10 only, where each doc also has nine
    // unique df=1 tokens: the unique tokens are rarer (df=1 < df=2), so
    // w10 sits at position 9 — ubound = 1 + min(0, 0) = 1 < minOverlap
    // ceil(0.5/1.5*20) = 7. But a 10-token doc at t=0.5 has prefix
    // length 10-5+1 = 6 < 10, so w10 isn't even indexed. Shrink the
    // prefix math: t=0.1, prefix length 10-1+1 = 10 (all indexed),
    // minOverlap = ceil(0.1/1.1*20) = 2 > ubound 1 — pruned positionally.
    val d = docs(
      (1L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 shared"),
      (2L, "v1 v2 v3 v4 v5 v6 v7 v8 v9 shared"))
    val ordered = Jaccard.dfOrderedSets(Jaccard.tokenized(d))
    val pre = Jaccard.prefixCandidates(ordered, 0.1, positional = false).count()
    val pos = Jaccard.prefixCandidates(ordered, 0.1, positional = true).count()
    assert(pre === 1L)
    assert(pos === 0L)
    // and correctness: J = 1/19 = 0.053 < 0.1, so the join agrees
    assert(joined(d, 0.1) === Set.empty)
  }

  /** Brute-force containment truth: directed co-occurring pairs with
    * inter/|A| >= t.
    */
  private def bruteContain(d: DataFrame, t: Double): Set[(Long, Long, Long)] = {
    val toks = Jaccard.tokenized(d)
    val posts = Jaccard.postings(toks)
    val pairs = posts.as("a")
      .join(posts.as("b"),
        col("a.word") === col("b.word") && col("a.docId") =!= col("b.docId"))
      .groupBy(col("a.docId").as("docA"), col("b.docId").as("docB"))
      .agg(count(lit(1)).as("inter"))
    pairs.join(Jaccard.docSizes(toks).withColumnRenamed("docId", "docA"), "docA")
      .filter(col("inter").cast("double") / col("size") >= lit(t))
      .select("docA", "docB", "inter")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def contained(d: DataFrame, t: Double): Set[(Long, Long, Long)] =
    Jaccard.containmentJoin(Jaccard.tokenized(d), t)
      .select("docA", "docB", "inter")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("containment is directional: the subset side sees 1.0") {
    val d = docs(
      1L -> "alpha beta gamma",
      2L -> "alpha beta gamma delta epsilon zeta")
    // C(1→2) = 3/3 = 1.0; C(2→1) = 3/6 = 0.5
    assert(contained(d, 1.0) === Set((1L, 2L, 3L)))
    assert(contained(d, 0.5) === Set((1L, 2L, 3L), (2L, 1L, 3L)))
    // Jaccard misses the asymmetric pair at the same bar
    assert(joined(d, 0.9) === Set.empty)
  }

  test("containment df-prune drops hot-word-only pairs, keeps exact values") {
    // "the" appears in every doc (df=4). Unpruned, the single-token doc
    // 4 is contained in everything through it; at maxDf=3 the hot word
    // leaves both posting streams, so pairs whose ONLY shared tokens
    // are hot vanish — while surviving pairs keep bit-identical values
    // (verification still intersects the full arrays).
    val d = docs(
      1L -> "the alpha beta gamma",
      2L -> "the alpha beta gamma delta epsilon",
      3L -> "the zeta eta theta iota",
      4L -> "the")
    def pairs(maxDf: Option[Long]): Map[(Long, Long), (Long, Double)] =
      Jaccard.containmentJoin(Jaccard.tokenized(d), 1.0, maxDf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(5)))
        .toMap
    val full = pairs(None)
    assert(full.keySet === Set((1L, 2L), (4L, 1L), (4L, 2L), (4L, 3L)))
    val pruned = pairs(Some(3L))
    assert(pruned.keySet === Set((1L, 2L)))
    // the surviving pair's inter/containment are the unpruned values
    assert(pruned((1L, 2L)) === full((1L, 2L)))
    assert(pruned((1L, 2L)) === ((4L, 1.0)))
  }

  test("containment matches brute force on a seeded random corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 30).map(i => s"tok$i")
    val rows = (1L to 50L).map { id =>
      val n = 2 + rnd.nextInt(10)
      id -> rnd.shuffle(vocab).take(n).mkString(" ")
    }
    val d = docs(rows: _*)
    for (t <- Seq(0.3, 0.6, 0.9, 1.0))
      assert(contained(d, t) === bruteContain(d, t), s"threshold $t")
  }

  test("matches brute force on a seeded random corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 40).map(i => s"tok$i")
    val rows = (1L to 60L).map { id =>
      val n = 3 + rnd.nextInt(12)
      id -> rnd.shuffle(vocab).take(n).mkString(" ")
    }
    val d = docs(rows: _*)
    for (t <- Seq(0.2, 0.5, 0.7, 0.9))
      assert(joined(d, t) === brute(d, t), s"threshold $t")
  }

  // ------------------------------------------------- thresholdMatches/Gate

  /** Brute-force cross truth: every co-occurring (arrival, indexed)
    * pair via full posting joins — no prefix machinery anywhere.
    */
  private def bruteMatches(arrD: DataFrame, idxD: DataFrame, t: Double)
      : Set[(Long, Long, Long)] = {
    val a = Jaccard.tokenized(arrD)
    val b = Jaccard.tokenized(idxD)
    val pairs = Jaccard.postings(a).withColumnRenamed("docId", "docA")
      .join(Jaccard.postings(b).withColumnRenamed("docId", "docB"), "word")
      .groupBy("docA", "docB").agg(count(lit(1)).as("inter"))
    pairs
      .join(Jaccard.docSizes(a).withColumnRenamed("docId", "docA")
        .withColumnRenamed("size", "sa"), "docA")
      .join(Jaccard.docSizes(b).withColumnRenamed("docId", "docB")
        .withColumnRenamed("size", "sb"), "docB")
      .filter(col("inter").cast("double") /
        (col("sa") + col("sb") - col("inter")) >= lit(t))
      .select("docA", "docB", "inter")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def matchedAgainst(arrD: DataFrame, idxD: DataFrame, t: Double)
      : Set[(Long, Long, Long)] =
    Jaccard.thresholdMatches(Jaccard.tokenized(arrD),
        Jaccard.dfOrderedSets(Jaccard.tokenized(idxD)), t)
      .select("docId", "matchId", "inter")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("thresholdMatches equals cross brute force on a hand-built split") {
    val arr = docs(
      1L -> "spark scala join shuffle partition",
      2L -> "quantum entangled qubits decohere fast",
      3L -> "spark scala join",
      4L -> "words the index has never seen anywhere")
    val idx = docs(
      11L -> "spark scala join shuffle partition",
      12L -> "spark scala join shuffle broadcast",
      13L -> "quantum entangled qubits decohere slowly",
      14L -> "completely unrelated corpus entry")
    for (t <- Seq(0.3, 0.5, 0.8, 0.99, 1.0))
      assert(matchedAgainst(arr, idx, t) === bruteMatches(arr, idx, t),
        s"threshold $t")
  }

  test("arrival pair exactly at the threshold is matched, with exact values") {
    // |A|=4, |B|=5, inter=4 (A ⊂ B): J = 4/5 = 0.8 exactly at t=0.8
    val arr = docs(1L -> "alpha beta gamma delta")
    val idx = docs(2L -> "alpha beta gamma delta epsilon")
    val rows = Jaccard.thresholdMatches(Jaccard.tokenized(arr),
        Jaccard.dfOrderedSets(Jaccard.tokenized(idx)), 0.8)
      .collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)) === (1L, 2L, 4L, 4L, 5L, 0.8))
    // ...and one ulp of threshold above loses it
    assert(matchedAgainst(arr, idx, 0.81) === Set.empty)
  }

  test("float-edge arrival prefix length cannot drop a true match") {
    // t=0.8, |A|=5: prefix length 5 - ceil(0.8*5) + 1 = 2. The
    // arrival's RAREST token under index-df order is 'unseen' (df=0,
    // absent from the index) and probes NOTHING — completeness must
    // come from the second prefix slot, so a prefix-length off-by-one
    // (the failure class the ceil slack guards at thresholds where
    // t*|A| lands an ulp above an integer) loses the J=0.8 match here.
    val arr = docs(1L -> "alpha beta gamma delta unseen")
    val idx = docs(
      2L -> "alpha beta gamma delta epsilon",   // inter=4, union=6: J=2/3
      3L -> "alpha beta gamma delta")           // inter=4, union=5: J=0.8
    assert(matchedAgainst(arr, idx, 0.8) === Set((1L, 3L, 4L)))
    assert(matchedAgainst(arr, idx, 0.6) === bruteMatches(arr, idx, 0.6))
  }

  test("duplicate tokens in raw batch arrays keep set semantics") {
    import spark.implicits._
    // raw normalizedWords-style arrays with repeats: the operator must
    // array_distinct them or |A|, the prefix bound and the Jaccard value
    // all drift — distinct sets are {a b c d} vs indexed {a b c d e}
    val rawBatch = Seq(
      (1L, Seq("a", "a", "b", "c", "a", "d", "b"))).toDF("docId", "tokens")
    val idx = Jaccard.dfOrderedSets(Jaccard.tokenized(
      docs(2L -> "a b c d e")))
    val rows = Jaccard.thresholdMatches(rawBatch, idx, 0.8).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)) === (1L, 2L, 4L, 4L, 5L, 0.8))
  }

  test("thresholdGate is the exact complement of the matched arrivals") {
    val arr = docs(
      1L -> "spark scala join shuffle partition",   // dup of 11 → dropped
      2L -> "quantum entangled qubits decohere",    // no match → survives
      3L -> "tokens the index never saw at all")    // df=0 probes → survives
    val idx = docs(
      11L -> "spark scala join shuffle partition",
      12L -> "completely unrelated corpus entry")
    val batch = Jaccard.tokenized(arr)
    val index = Jaccard.dfOrderedSets(Jaccard.tokenized(idx))
    val kept = Jaccard.thresholdGate(batch, index, 0.9)
      .select("docId").collect().map(_.getLong(0)).toSet
    val matchedIds = Jaccard.thresholdMatches(batch, index, 0.9)
      .select("docId").collect().map(_.getLong(0)).toSet
    assert(matchedIds === Set(1L))
    assert(kept === Set(2L, 3L))
    assert((kept ++ matchedIds) === Set(1L, 2L, 3L))
  }

  test("thresholdMatches equals cross brute force on a seeded random split") {
    val rnd = new scala.util.Random(13)
    val vocab = (1 to 30).map(i => s"tok$i")
    val rows = (1L to 60L).map { id =>
      val n = 3 + rnd.nextInt(10)
      id -> rnd.shuffle(vocab).take(n).mkString(" ")
    }
    val arr = docs(rows.filter(_._1 % 3 == 0): _*)
    val idx = docs(rows.filter(_._1 % 3 != 0): _*)
    for (t <- Seq(0.2, 0.5, 0.7, 0.9))
      assert(matchedAgainst(arr, idx, t) === bruteMatches(arr, idx, t),
        s"threshold $t")
  }
}
