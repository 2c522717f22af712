package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextAnalysis
import graft.operators.{Dedup, Knn}

/** Semantic dedup (SemDeDup-style), unigram-LM scoring, and vocabulary
  * ranking.
  */
class SemanticVocabSpec extends SparkSpec {
  import spark.implicits._

  private def unit(xs: Double*): Array[Float] = {
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(x => (x / n).toFloat).toArray
  }

  test("semanticKeepers keeps the cluster minimum and every singleton") {
    // two orthogonal directions = two IVF cells; ids 0/2/4 are one
    // near-dup cluster in cell A, id 1 is alone in cell B, id 3 sits in
    // cell A but below the threshold vs everyone
    val e1 = unit(1, 0, 0, 0)
    val e2 = unit(0, 1, 0, 0)
    val tilted = unit(1, 0.05, 0, 0) // cos vs e1 ≈ 0.9988
    val offAxis = unit(1, 1.2, 0.9, 0.4) // in no tight pair
    val embs = Seq(
      (0L, e1), (1L, e2), (2L, tilted), (3L, offAxis), (4L, e1)
    ).toDF("id", "vec")
    val cents = Seq((0L, e1), (1L, e2)).toDF("cid", "cvec")
    val docs = embs.select(col("id"))
    val kept = Dedup.semanticKeepers(docs, embs, "id", "vec", cents,
      minCosine = 0.95).as[Long].collect().sorted
    // cluster {0,2,4} → keeper 0; 1 and 3 untouched
    assert(kept.toSeq == Seq(0L, 1L, 3L))
  }

  test("semanticKeepers never pairs across cells (the quantizer trade)") {
    // v0 and v1 have cosine ≈ 0.857 (≥ τ = 0.8) but assign to different
    // cells, so they are never compared and both survive — the standard
    // approximate-dedup recall trade, priced by centroid quality
    val v0 = unit(1, 0)
    val v1 = unit(1, 0.6) // cos(v0,v1) = 1/sqrt(1.36) ≈ 0.857
    val embs = Seq((0L, v0), (1L, v1)).toDF("id", "vec")
    val cents = Seq((0L, unit(1, 0)), (1L, unit(1, 1))).toDF("cid", "cvec")
    // v0: cos to c0 = 1 > cos to c1 ≈ 0.707 → cell 0
    // v1: cos to c1 ≈ 0.970 > cos to c0 ≈ 0.857 → cell 1
    val kept = Dedup.semanticKeepers(embs.select(col("id")), embs,
      "id", "vec", cents, minCosine = 0.8).as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 1L))
    // sanity: with ONE centroid (one cell) the same pair does dedup
    val oneCell = Seq((0L, unit(1, 0))).toDF("cid", "cvec")
    val keptOne = Dedup.semanticKeepers(embs.select(col("id")), embs,
      "id", "vec", oneCell, minCosine = 0.8).as[Long].collect().sorted
    assert(keptOne.toSeq == Seq(0L))
  }

  test("unigramLogProb matches the hand-computed smoothed score") {
    val model = Seq((10L, "a a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a c")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramLogProb(model, docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "sum_logprob", "avg_logprob")
      .as[(Long, Long, Double, Double)].head()
    // counts: a=2, b=1; N=3, V=2 → p(a)=3/5, p(c)=1/5 (OOV, smoothed)
    val expSum = math.log(3.0 / 5.0) + math.log(1.0 / 5.0)
    assert(r._1 == 1L && r._2 == 2L)
    assert(math.abs(r._3 - expSum) < 1e-12, s"sum ${r._3} != $expSum")
    assert(math.abs(r._4 - expSum / 2) < 1e-12)
  }

  test("unigramLogProb fails fast on a model with no alphanumeric tokens") {
    // an empty model would null every score and make a downstream
    // `avg_logprob >= floor` gate silently drop the whole corpus
    val model = Seq((10L, "??? !!!")).toDF("doc_id", "text")
    val docs = Seq((1L, "a c")).toDF("doc_id", "text")
    val err = intercept[Exception] {
      TextAnalysis.unigramLogProb(model, docs, "doc_id", "text").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(err).exists(_.contains("no alphanumeric tokens")), msgs(err))
  }

  test("bigramLogProb scores seen bigrams by conditional MLE and unseen " +
    "by scaled smoothed unigram backoff") {
    // model "a b a": unigrams a=2 b=1 (N=3, V=2); bigrams (a,b)=1 (b,a)=1
    // doc "a b c": (a,b) seen → ln(1/2); (b,c) unseen → ln(0.4·(0+1)/5)
    val model = Seq((10L, "a b a")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b c"), (2L, "a")).toDF("doc_id", "text")
    val rows = TextAnalysis.bigramLogProb(model, docs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "sum_logprob", "avg_logprob")
      .as[(Long, Long, Double, Double)].collect()
    // the single-token doc has no bigrams and is absent
    assert(rows.map(_._1).toSeq == Seq(1L))
    val r = rows.head
    val expSum = math.log(1.0 / 2.0) + math.log(0.4 * (1.0 / 5.0))
    assert(r._2 == 2L)
    assert(math.abs(r._3 - expSum) < 1e-12, s"sum ${r._3} != $expSum")
    assert(math.abs(r._4 - expSum / 2) < 1e-12)
  }

  test("bigramLogProb is bit-identical across partitionings") {
    val rnd = new scala.util.Random(13)
    val docs = Seq.tabulate(60) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40) + 2)(s"w${rnd.nextInt(25)}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    def run(parts: Int): Map[Long, (Long, Double, Double)] =
      TextAnalysis.bigramLogProb(docs.repartition(parts),
        docs.repartition(parts), "doc_id", "text")
        .as[(Long, Long, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val one = run(1)
    val many = run(7)
    assert(one.keySet == many.keySet)
    one.foreach { case (id, (n, s, a)) =>
      val (n2, s2, a2) = many(id)
      assert(n == n2 && s == s2 && a == a2, s"doc $id: ($n,$s,$a) != ($n2,$s2,$a2)")
    }
  }

  test("unigramLogProb is bit-identical across partitionings") {
    val rnd = new scala.util.Random(11)
    val docs = Seq.tabulate(60) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40) + 1)(s"w${rnd.nextInt(25)}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    def run(parts: Int): Map[Long, (Long, Double, Double)] =
      TextAnalysis.unigramLogProb(docs.repartition(parts),
        docs.repartition(parts), "doc_id", "text")
        .as[(Long, Long, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val one = run(1)
    val many = run(7)
    assert(one.keySet == many.keySet)
    one.foreach { case (id, (n, s, a)) =>
      val (n2, s2, a2) = many(id)
      assert(n == n2 && s == s2 && a == a2,
        s"doc $id diverged across partitionings: ($s,$a) vs ($s2,$a2)")
    }
  }

  test("tokenIds maps positions in order and OOV to the sentinel") {
    val vocab = Seq(("the", 1L), ("cat", 2L), ("sat", 3L))
      .toDF("token", "token_id")
    val docs = Seq(
      (1L, "The cat SAT on the cat"), // "on" is OOV
      (2L, "???")                     // no alnum chars → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenIds(docs, vocab, "doc_id", "text")
      .select("doc_id", "token_ids", "n_tokens")
      .as[(Long, Seq[Long], Long)].collect()
    assert(out.toSeq == Seq((1L, Seq(1L, 2L, 3L, 0L, 1L, 2L), 6L)))
  }

  test("buildVocab two-level ranking equals the global row_number") {
    val rnd = new scala.util.Random(3)
    val docs = Seq.tabulate(80) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30) + 1)(s"t${rnd.nextInt(40)}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(docs, "text", minCount = 2L)
    val global = vocab
      .withColumn("expected",
        row_number().over(Window.orderBy(col("cnt").desc, col("token")))
          .cast("long"))
    assert(global.filter(col("token_id") =!= col("expected")).isEmpty)
    // ids are a 1-based contiguous sequence
    val ids = vocab.select("token_id").as[Long].collect().sorted
    assert(ids.toSeq == (1L to ids.length).toSeq)
    // minCount actually excludes singletons
    val minCnt = vocab.agg(min("cnt")).as[Long].head()
    assert(minCnt >= 2L)
  }

  test("perplexityBuckets splits the corpus into ordered terciles") {
    // model = "a": p(a) = (1+1)/(1+1) = 1 → lp 0; OOV → ln(1/2).
    // doc k holds k 'a's + (6-k) distinct OOV words, so
    // avg_logprob(k) = (6-k)/6 * ln(1/2) — strictly increasing in k
    val model = Seq((100L, "a")).toDF("doc_id", "text")
    val docs = Seq.tabulate(6) { k =>
      val words = Seq.fill(k)("a") ++ (0 until (6 - k)).map(j => s"oov${k}x$j")
      (k.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextAnalysis.perplexityBuckets(model, docs, "doc_id", "text")
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(out == Map(0L -> "tail", 1L -> "tail", 2L -> "middle",
      3L -> "middle", 4L -> "head", 5L -> "head"))
    // and the bucket is a function of the score: re-run on a shuffled
    // partitioning gives the identical assignment
    val again = TextAnalysis.perplexityBuckets(model, docs.repartition(5),
      "doc_id", "text")
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(again == out)
  }

  test("dsirWeights matches the hand-computed log-likelihood ratio") {
    // target "a a b": p_t(w) = (c+1)/5 → a:3/5, OOV:1/5
    // raw    "c c d": p_r(w) = (c+1)/5 → c:3/5, OOV:1/5
    // doc "a a c": lw = 2*(ln(3/5)-ln(1/5)) + (ln(1/5)-ln(3/5)) = ln 3
    val target = Seq((10L, "a a b")).toDF("doc_id", "text")
    val raw = Seq((20L, "c c d")).toDF("doc_id", "text")
    val docs = Seq((1L, "a a c")).toDF("doc_id", "text")
    val r = TextAnalysis.dsirWeights(target, raw, docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "log_weight", "avg_log_weight")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 == 1L && r._2 == 3L)
    assert(math.abs(r._3 - math.log(3.0)) < 1e-12, s"lw ${r._3}")
    assert(math.abs(r._4 - math.log(3.0) / 3) < 1e-12)
    // sign sanity: a raw-like doc scores negative
    val neg = TextAnalysis.dsirWeights(target, raw,
      Seq((2L, "c c d d")).toDF("doc_id", "text"), "doc_id", "text")
      .select("log_weight").as[Double].head()
    assert(neg < 0, s"raw-like doc scored $neg")
  }

  test("corpusReport labels languages and its rollup subtotals add up") {
    val docs = Seq(
      ("s1", "the cat and the dog in the house for a day is it that"),
      ("s1", "le chat est dans la maison et il mange pour vivre"),
      ("s2", "the quick brown fox jumps over the lazy dog in a field"),
      ("s2", "zz qq xx") // no stopword hits → und
    ).toDF("source", "text")
    val rows = TextAnalysis.corpusReport(docs, "text", "source")
      .select("source", "lang_pred", "n_docs", "n_tokens")
      .as[(Option[String], Option[String], Long, Long)].collect()
    val leaf = rows.collect { case (Some(s), Some(l), d, t) => ((s, l), (d, t)) }.toMap
    assert(leaf.keySet == Set(("s1", "en"), ("s1", "fr"), ("s2", "en"),
      ("s2", "und")))
    // per-source subtotals equal the sum of their leaves
    val bySrc = rows.collect { case (Some(s), None, d, t) => (s, (d, t)) }.toMap
    assert(bySrc("s1") == ((2L, leaf(("s1", "en"))._2 + leaf(("s1", "fr"))._2)))
    assert(bySrc("s2") == ((2L, leaf(("s2", "en"))._2 + leaf(("s2", "und"))._2)))
    // grand total covers every doc and token
    val total = rows.collect { case (None, None, d, t) => (d, t) }.head
    assert(total == ((4L, rows.collect { case (Some(_), Some(_), _, t) => t }.sum)))
  }

  test("winnowing guarantees a shared fingerprint for substrings >= k+w-1") {
    // with k=5, w=4 any shared canonical substring of length >= 8 must
    // yield at least one shared fingerprint (the winnowing guarantee)
    val shared = "matchingrunxyz"
    val docs = Seq(
      (1L, s"aaa bbb $shared ccc"),
      (2L, s"ddd $shared eee fff"),
      (3L, "completely unrelated text with nothing in common at all"),
      (4L, "ab") // canonical length 2 < k → unrepresented
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, "doc_id", "text",
      k = 5, w = 4)
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared run must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty, "unrelated docs should not collide")
    assert(fps(3L).nonEmpty)
    assert(!fps.contains(4L))
    // density: far fewer fingerprints than k-gram positions
    val canonLen3 = "completely unrelated text with nothing in common at all".length
    assert(fps(3L).size <= canonLen3 - 5 + 1)
    // a doc with >= k chars but fewer than w windows still emits its min
    val tiny = Seq((9L, "abcdef")).toDF("doc_id", "text") // 2 windows < w
    val tinyFps = TextAnalysis.winnowFingerprints(tiny, "doc_id", "text",
      k = 5, w = 4).as[(Long, Long)].collect()
    assert(tinyFps.length == 1, s"got ${tinyFps.toSeq}")
  }

  test("winnowOverlapPairs finds shared-run pairs and prunes hot fingerprints") {
    val run = "a long shared boilerplate run that both documents carry verbatim"
    val docs = Seq(
      (1L, s"first document begins here $run and then diverges entirely"),
      (2L, s"second document other intro $run with a different ending too"),
      (3L, "third document has no overlap with anything else at all here"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowOverlapPairs(docs, "doc_id", "text",
      k = 16, w = 4, minShared = 2L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // a fingerprint present in EVERY doc gets pruned by the df cap: give
    // all three docs the same run and cap df at 2 — no pair survives
    // minShared if the shared fingerprints all exceed the cap
    val all3 = Seq(
      (1L, s"alpha $run omega"), (2L, s"beta $run psi"), (3L, s"gamma $run chi"))
      .toDF("doc_id", "text")
    val capped = TextAnalysis.winnowOverlapPairs(all3, "doc_id", "text",
      k = 16, w = 4, minShared = 1L, maxDocFrequency = 2L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val uncapped = TextAnalysis.winnowOverlapPairs(all3, "doc_id", "text",
      k = 16, w = 4, minShared = 1L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(capped.isEmpty, s"df cap should prune the 3-doc run: $capped")
  }

  test("native winnow kernel matches the composed HOF formulation") {
    val rnd = new scala.util.Random(17)
    val docs = Seq.tabulate(40) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(40)}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    for ((k, w) <- Seq((5, 4), (3, 7), (8, 1))) {
      val native = TextAnalysis.winnowFingerprints(docs, "doc_id", "text",
        k, w).as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val composed = TextAnalysis.winnowFingerprintsComposed(docs,
        "doc_id", "text", k, w).as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      assert(native == composed, s"k=$k w=$w")
    }
  }

  test("pmiCollocations matches a plain-Scala reference with exact prunes") {
    val rnd = new scala.util.Random(213)
    val vocab = ('a' to 'j').map(_.toString)
    val docsSeq = (1L to 40L).map { id =>
      id -> Seq.fill(3 + rnd.nextInt(5))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val got = TextAnalysis.pmiCollocations(
      docsSeq.toDF("doc_id", "text"), "doc_id", "text", minCount = 3L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // the reference: distinct word sets per doc, document counts
    val sets = docsSeq.map { case (id, t) => id -> t.split(" ").toSet }
    val df = vocab.map(w => w -> sets.count(_._2.contains(w))).toMap
    val n = sets.size.toDouble
    val want = (for {
      a <- vocab; b <- vocab if a < b
      c = sets.count(s => s._2.contains(a) && s._2.contains(b))
      if c >= 3 && df(a) >= 3 && df(b) >= 3
    } yield (a, b) -> ((c.toLong, df(a).toLong, df(b).toLong,
      math.log(n * c / (df(a).toDouble * df(b).toDouble))))).toMap
    assert(got.keySet === want.keySet)
    for ((k, (c, da, dbb, pmi)) <- want) {
      val (gc, gda, gdb, gpmi) = got(k)
      assert((gc, gda, gdb) === ((c, da, dbb)), s"$k")
      assert(math.abs(gpmi - pmi) < 1e-12, s"$k")
    }
    assert(want.nonEmpty, "fixture produced no qualifying pair")
  }

  test("pmiCollocations stop-word cap drops the hot word's pairs only") {
    // 'x' is in every doc (df 6 > cap 5); (a, b) survives untouched
    val c = Seq(
      (1L, "x a b"), (2L, "x a b"), (3L, "x a b"),
      (4L, "x a"), (5L, "x b"), (6L, "x c")).toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(c, "doc_id", "text",
      minCount = 3L, maxDocFrequency = Some(5L))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "b")))
  }

  test("windowedCooccurrence matches a plain-Scala harmonic reference") {
    import graft.operators.Retrieval
    val rnd = new scala.util.Random(214)
    val vocab = ('a' to 'f').map(_.toString)
    val docsSeq = (1L to 25L).map { id =>
      id -> Seq.fill(4 + rnd.nextInt(6))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val posts = Retrieval.positionalPostings(
      docsSeq.toDF("doc_id", "text"), "doc_id", "text").localCheckpoint()
    val got = TextAnalysis.windowedCooccurrence(posts, window = 3,
      minCount = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // the reference: enumerate every in-window ordered pair, fold the
    // harmonic sum per unordered pair over ascending distance
    val byDist = scala.collection.mutable.Map
      .empty[(String, String, Long), Long]
    for ((_, t) <- docsSeq; ws = t.split(" ");
         i <- ws.indices; d <- 1 to 3 if i + d < ws.length) {
      val (x, y) = (ws(i), ws(i + d))
      val (a, b) = if (x <= y) (x, y) else (y, x)
      byDist((a, b, d.toLong)) = byDist.getOrElse((a, b, d.toLong), 0L) + 1
    }
    val want = byDist.keys.map { case (a, b, _) => (a, b) }.toSet.flatMap {
      (k: (String, String)) =>
        val ds = (1L to 3L).flatMap(d =>
          byDist.get((k._1, k._2, d)).map(n => (d, n)))
        val n = ds.map(_._2).sum
        if (n >= 2)
          Some(k -> ((n, ds.foldLeft(0.0)((acc, x) =>
            acc + x._2.toDouble / x._1.toDouble))))
        else None
    }.toMap
    assert(got.keySet === want.keySet)
    for ((k, (n, c)) <- want) {
      assert(got(k)._1 === n, s"$k")
      assert(math.abs(got(k)._2 - c) < 1e-12, s"$k")
    }
    // same-word pairs (X_aa) must be present in a repetitive corpus
    assert(want.keys.exists(k => k._1 == k._2), "no X_aa pair")
  }

  test("dsirWeights fails fast when either model is empty") {
    val good = Seq((10L, "a b")).toDF("doc_id", "text")
    val empty = Seq((20L, "!!!")).toDF("doc_id", "text")
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val e1 = intercept[Exception] {
      TextAnalysis.dsirWeights(empty, good, docs, "doc_id", "text").collect()
    }
    assert(msgs(e1).exists(_.contains("dsirWeights(target)")), msgs(e1))
    val e2 = intercept[Exception] {
      TextAnalysis.dsirWeights(good, empty, docs, "doc_id", "text").collect()
    }
    assert(msgs(e2).exists(_.contains("dsirWeights(raw)")), msgs(e2))
  }
}
