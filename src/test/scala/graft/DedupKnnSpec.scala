package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextFunctions}
import graft.operators.{Dedup, Jaccard, Knn}

/** Dedup suite, ANN, and the native vector expression. */
class DedupKnnSpec extends SparkSpec {
  import spark.implicits._

  test("DotProductFloat matches the fold formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val vecs = Seq.tabulate(50) { i =>
      (i.toLong, Array.fill(17)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "v")
    val both = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        GraftFunctions.dotF32(col("a.v"), col("b.v")).as("native"),
        Knn.dot(col("a.v"), col("b.v")).as("fold"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"native ${r.getDouble(0)} != fold ${r.getDouble(1)}")
    }
  }

  test("DotProductFloat null/shape semantics match zip_with padding") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1f, 2f), Array(3f, 4f)),       // plain
      (Array.empty[Float], Array.empty[Float]) // empty → 0.0
    ).toDF("a", "b")
    val vals = df.select(GraftFunctions.dotF32(col("a"), col("b"))).as[Option[Double]].collect()
    assert(vals.toSeq == Seq(Some(11.0), Some(0.0)))
    // mismatched lengths → null (zip_with pads with null, poisoning the sum)
    val mm = Seq((Array(1f, 2f), Array(3f))).toDF("a", "b")
    val mismatch = mm.select(GraftFunctions.dotF32(col("a"), col("b")).as("d"),
      Knn.dot(col("a"), col("b")).as("f")).head()
    assert(mismatch.isNullAt(0) && mismatch.isNullAt(1))
  }

  test("DotProductMixed matches the fold formulation bit-for-bit on " +
    "every type pairing") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val f = Seq.tabulate(30) { i =>
      (i.toLong, Array.fill(9)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "vf")
      .withColumn("vd", transform(col("vf"), x => x.cast("double")))
    val both = f.as("a").crossJoin(f.as("b"))
      .select(
        GraftFunctions.dotMixed(col("a.vf"), col("b.vd")).as("fd"),
        GraftFunctions.dotMixed(col("a.vd"), col("b.vf")).as("df"),
        GraftFunctions.dotMixed(col("a.vd"), col("b.vd")).as("dd"),
        GraftFunctions.dotMixed(col("a.vf"), col("b.vf")).as("ff"),
        Knn.dot(col("a.vf"), col("b.vf")).as("fold"))
      .collect()
    both.foreach { r =>
      val fold = r.getDouble(4)
      for (i <- 0 to 3)
        assert(r.getDouble(i) == fold,
          s"pairing $i: ${r.getDouble(i)} != fold $fold")
    }
    // mismatched lengths → null, like the zip_with padding
    val mm = Seq((Array(1f, 2f), Array(3.0))).toDF("a", "b")
    assert(mm.select(GraftFunctions.dotMixed(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("native n-gram and minhash kernels match the composed formulations") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val words = Seq.tabulate(200) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(9))(s"w${rnd.nextInt(30)}"))
    }.toDF("id", "ws")
    val shingleCmp = words.select(
      TextFunctions.wordShinglesOf(col("ws"), 3).as("zip"),
      array_distinct(GraftFunctions.wordNGrams(col("ws"), 3)).as("native"))
      .as[(Seq[String], Seq[String])].collect()
    shingleCmp.foreach { case (z, n) => assert(z == n) }

    val hashes = Seq.tabulate(100) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(20) + 1)(rnd.nextLong().abs
        % graft.functions.HashFunctions.MinHashPrime))
    }.toDF("id", "hs")
    val sigCmp = hashes.select(
      graft.functions.HashFunctions.minHashSignatureFromHashes(col("hs"), 8)
        .as("folds"),
      GraftFunctions.minHashSig(col("hs"), 8).as("native"))
      .as[(Seq[Long], Seq[Long])].collect()
    sigCmp.foreach { case (f, n) => assert(f == n) }

    val shCmp = hashes.select(
      graft.functions.HashFunctions.simHash(col("hs"), 32).as("folds"),
      GraftFunctions.simHash(col("hs"), 32).as("native"))
      .as[(Long, Long)].collect()
    shCmp.foreach { case (f, n) => assert(f == n) }
  }

  test("cleanText kernel: NFC compose, control strip, ws collapse, trim") {
    GraftFunctions.register(spark)
    val rows = Seq(
      (1L, "  hello\t\tworld \n"),   // ws runs collapse, ends trim
      (2L, "a\u0001b"),          // bare control: strip, no boundary
      (3L, "a \u0001 b"),        // control inside a ws run
      (4L, "cafe\u0301 au lait"), // NFC: e + combining acute → é
      (5L, "\u0007\u0008 \u007f"), // controls + ws only → empty
      (6L, "")                       // empty stays empty
    ).toDF("id", "text")
    val out = rows
      .select(col("id"), GraftFunctions.cleanText(col("text")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "hello world")
    assert(out(2L) == "ab")
    assert(out(3L) == "a b")
    assert(out(4L) == "caf\u00e9 au lait")
    assert(out(5L) == "")
    assert(out(6L) == "")
    // null in, null out; and the SQL-registry path resolves the kernel
    val viaSql = rows.sparkSession
      .sql("SELECT graft_clean_text('  x\ty  '), graft_clean_text(NULL)")
      .head()
    assert(viaSql.getString(0) == "x y" && viaSql.isNullAt(1))
  }

  test("word shingles: short docs, empty docs, dedup") {
    val df = Seq(
      ("a b c d", 1), ("a b", 2), ("a", 3), ("!!!", 4), ("x y x y x y", 5))
      .toDF("text", "id")
      .select(col("id"), TextFunctions.wordShingles(col("text"), 3).as("sh"))
    val m = df.as[(Int, Seq[String])].collect().toMap
    assert(m(1) == Seq("a b c", "b c d"))
    assert(m(2) == Seq("a b"))   // len < n → one short shingle
    assert(m(3) == Seq("a"))
    assert(m(4) == Seq.empty)    // no tokens → no shingles
    assert(m(5) == Seq("x y x", "y x y")) // dedup keeps first occurrence
  }

  test("char shingles slide over the canonical text") {
    graft.functions.GraftFunctions.register(spark)
    val sh = Seq(("ab cd", 1)).toDF("text", "id")
      .select(TextFunctions.charShingles(col("text"), 3).as("sh"))
      .as[Seq[String]].head()
    assert(sh == Seq("ab ", "b c", " cd"))
  }

  test("native char n-gram kernel matches the composed HOF formulation") {
    graft.functions.GraftFunctions.register(spark)
    val texts = Seq("ab cd", "aaaaaa", "x", "", "Hello, WORLD! 42",
      "the the the quick fox")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(2, 3, 5, 50)) {
      val native = texts
        .select($"id", TextFunctions.charShingles($"text", n).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      val composed = texts
        .select($"id", TextFunctions.charShinglesComposed($"text", n).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      assert(native == composed, s"n=$n")
    }
  }

  test("exact dedup groups by content hash and keeps min id") {
    val docs = Seq((10L, "same text"), (3L, "same text"), (5L, "other"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().map { case (_, k, n) => (k, n) }.toMap
    assert(groups == Map(3L -> 2L, 5L -> 1L))
    val kept = Dedup.exactDeduped(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 5L))
  }

  test("identical docs collide on every LSH band; estimate is 1.0") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words entirely here now"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", k = 8)
    val cands = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
      .as[(Long, Long, Long)].collect()
    assert(cands.toSeq == Seq((1L, 2L, 4L)), "only the identical pair, all 4 bands")
    val est = Dedup.minHashEstimate(
      Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
        .select("id_a", "id_b"), sigs, "doc_id", k = 8)
      .as[(Long, Long, Double)].head()
    assert(est == ((1L, 2L, 1.0)))
  }

  test("lshCandidatesSweep equals an independent lshCandidates run at " +
    "every level (one join carries all band counts)") {
    // overlapping docs at several similarity grades so different band
    // counts admit different candidate sets
    val docs = (0L until 12L).map { i =>
      val shift = (i % 4) * 5
      (i, (shift until shift + 20).map(j => s"tok$j").mkString(" "))
    }.toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", k = 8,
      tokenize = Dedup.shingleTokenizer(3)).localCheckpoint()
    val sweep = Dedup.lshCandidatesSweep(sigs, "doc_id", k = 8,
      bandCounts = Seq(1, 2, 4, 8))
      .as[(Int, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (b, xs) =>
        b -> xs.map(x => (x._2, x._3, x._4)).toSet }
    for (b <- Seq(1, 2, 4, 8)) {
      val indep = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = b)
        .as[(Long, Long, Long)].collect().toSet
      assert(sweep.getOrElse(b, Set.empty) == indep,
        s"bands=$b: sweep ${sweep.getOrElse(b, Set.empty)} != independent $indep")
    }
    // monotone by construction: coarser bands are subsets of finer
    assert(sweep(1).map(p => (p._1, p._2)).subsetOf(
      sweep(8).map(p => (p._1, p._2))))
    // invalid level sets are rejected loudly
    intercept[IllegalArgumentException] {
      Dedup.lshCandidatesSweep(sigs, "doc_id", k = 8, Seq(3, 8))
    }
  }

  test("PROPERTY: sweep == independent lshCandidates on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small vocabulary forces real band collisions at tiny sizes
    val word = Gen.oneOf("red", "blue", "green", "jade", "onyx")
    val docGen = Gen.chooseNum(3, 10).flatMap(n => Gen.listOfN(n, word))
    val corpusGen = Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, docGen))
    val prop = Prop.forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val sigs = Dedup.minHashSignatures(df, "doc_id", "text", k = 8)
        .localCheckpoint()
      val sweep = Dedup.lshCandidatesSweep(sigs, "doc_id", k = 8,
        bandCounts = Seq(1, 2, 4, 8))
        .as[(Int, Long, Long, Long)].collect()
        .groupBy(_._1).view
        .mapValues(_.map(x => (x._2, x._3, x._4)).toSet).toMap
      Seq(1, 2, 4, 8).forall { b =>
        sweep.getOrElse(b, Set.empty) ==
          Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = b)
            .as[(Long, Long, Long)].collect().toSet
      }
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(r.passed, r.status.toString)
  }

  test("minhash estimate tracks true jaccard on overlapping docs") {
    // two docs sharing half their tokens: true J = 10/30 ≈ 0.33
    val a = (1 to 20).map(i => s"tok$i").mkString(" ")
    val b = (11 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", k = 64)
    val est = Dedup.minHashEstimate(
      Seq((1L, 2L)).toDF("id_a", "id_b"), sigs, "doc_id", k = 64)
      .select("est_jaccard").as[Double].head()
    val trueJ = 10.0 / 40.0
    assert(math.abs(est - trueJ) < 0.15, s"est $est vs true $trueJ")
  }

  test("MinHashAggregator over postings equals the array-based signatures") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "beta delta zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val fromArrays = Dedup.minHashSignatures(docs, "doc_id", "text", k = 8)
      .select("doc_id", "perm", "min_hash")
      .as[(Long, Int, Long)].collect().toSet
    val postings = docs.select(col("doc_id"),
      explode(TextFunctions.normalizeTokens(col("text"))).as("tok"))
    val fromPostings = Dedup.minHashSignaturesFromPostings(
      postings, "doc_id", "tok", k = 8)
      .select("doc_id", "perm", "min_hash")
      .as[(Long, Int, Long)].collect().toSet
    assert(fromPostings == fromArrays)
  }

  test("simhash of identical docs is identical; near-dups found in block") {
    val docs = Seq((1L, "the quick brown fox jumps", "s1"),
      (2L, "the quick brown fox jumps", "s1"),
      (3L, "unrelated content entirely different", "s1"))
      .toDF("doc_id", "text", "source")
    val sims = Dedup.simHashes(docs, "doc_id", "text")
      .join(docs.select("doc_id", "source"), "doc_id")
    val dups = Dedup.simHashNearDups(sims, "doc_id", col("source"), maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(dups.toSeq == Seq((1L, 2L)))
  }

  test("ngram jaccard pairs: identical docs score 1.0, requires threshold > 0") {
    val docs = Seq((1L, "a b c d e f", "s"), (2L, "a b c d e f", "s"),
      (3L, "z y x w v u", "s")).toDF("doc_id", "text", "source")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      blockCol = col("source"), minJaccard = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, col("source"), 0.0)
    }
  }

  test("HLL estimate lands near the true distinct count; shards merge") {
    import graft.operators.Hll
    val n = 5000
    val vals = (1 to n).map(i => ("g", s"value_$i")).toDF("g", "v")
    val regs = Hll.registers(vals, Seq("g"), "v", m = 256)
    val est = Hll.estimate(regs, Seq("g"), m = 256)
      .select("estimate").as[Double].head()
    assert(math.abs(est - n) / n < 0.15, s"estimate $est vs true $n")

    // sketches of two shards merged by elementwise max == whole-corpus sketch
    val (s1, s2) = ((1 to n / 2).map(i => ("g", s"value_$i")),
      (n / 2 + 1 to n).map(i => ("g", s"value_$i")))
    val merged = Hll.registers(s1.toDF("g", "v"), Seq("g"), "v", 256)
      .unionAll(Hll.registers(s2.toDF("g", "v"), Seq("g"), "v", 256))
      .groupBy("g", "bucket").agg(max("rho").as("rho"))
    val wholeSet = regs.as[(String, Long, Long)].collect().toSet
    val mergedSet = merged.as[(String, Long, Long)].collect().toSet
    assert(mergedSet == wholeSet)
  }

  test("brute-force KNN returns exact top-k by cosine") {
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)), (4L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    val top = Knn.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 2)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().toSeq
    assert(top == Seq((2L, 1L), (3L, 2L)))
  }

  test("LSH buckets: identical vectors share buckets in every table") {
    val vecs = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(1f, 2f, 3f)),
      (3L, Array(-3f, 1f, -2f))).toDF("vec_id", "embedding")
    val b = Knn.lshBuckets(vecs, "vec_id", "embedding", tables = 3, planes = 4)
      .as[(Long, Int, Long)].collect()
    val byTable = b.groupBy(_._2).view.mapValues(_.map(r => r._1 -> r._3).toMap)
    (0 until 3).foreach { t =>
      assert(byTable(t)(1L) == byTable(t)(2L), s"identical vecs differ in table $t")
    }
    val top = Knn.lshTopK(vecs, "vec_id", "embedding", k = 1,
      tables = 3, planes = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(top.get(1L).contains(2L) && top.get(2L).contains(1L))
  }

  test("connected components resolve transitive near-dup clusters") {
    // chain 1-2-3 (one cluster), pair 8-9, isolated edge 5-5? no: 5-6
    val edges = Seq((2L, 1L), (2L, 3L), (8L, 9L), (5L, 6L))
      .toDF("id_a", "id_b")
    val comps = graft.operators.Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      8L -> 8L, 9L -> 8L, 5L -> 5L, 6L -> 5L))
    // empty edge list -> empty labeling, no infinite loop
    assert(graft.operators.Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0L)
    // string ids work too (convergence is row-wise, not a numeric sum)
    val strComps = graft.operators.Dedup.connectedComponents(
      Seq(("b", "a"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b"))
      .as[(String, String)].collect().toMap
    assert(strComps == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  test("SRP bucket of a wrong-dim or null-element vector is null, not 0") {
    val vecs = Seq(
      (1L, Array(1f, 2f, 3f)),          // matches dim=3
      (2L, Array(1f, 2f)),              // wrong dim
      (3L, Array(1f, Float.NaN, 3f)))   // NaN is fine; nulls tested below
      .toDF("vec_id", "embedding")
    graft.functions.GraftFunctions.register(spark)
    val b = vecs.select($"vec_id",
      Knn.lshBucket($"embedding", table = 0, planes = 4, dim = 3).as("b"))
      .as[(Long, Option[Long])].collect().toMap
    assert(b(1L).isDefined && b(3L).isDefined)
    assert(b(2L).isEmpty, "wrong-dim vector must bucket to null")
    val withNullElem = spark.sql(
      "SELECT graft_srp_bucket(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(array(0.5d, 0.5d))) AS b")
      .collect().head.isNullAt(0)
    assert(withNullElem, "null element must bucket to null")
  }

  test("IVF: cells follow cosine, probes bound candidates, re-rank exact") {
    // two well-separated directions; ids 1 and 2 seed the centroids
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f)), (4L, Array(0.1f, 0.9f, 0f)),
      (5L, Array(1f, 0.05f, 0f))).toDF("vec_id", "embedding")
    val cents = Knn.ivfSeedCentroids(vecs, "vec_id", "embedding", 2)
    val assigned = Knn.ivfAssign(vecs, "vec_id", "embedding", cents)
      .as[(Long, Long)].collect().toMap
    assert(assigned == Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 2L -> 2L, 4L -> 2L))

    // nprobe=1: query 3 probes only cell 1 -> candidates {1, 5}, exact
    // cosine ranks 5 (0.9,0.05) above 1 (1,0)? cos(3,1)=0.9939,
    // cos(3,5)=0.9965 -> neighbor 5 first, then 1; 4 is never scanned
    val top = Knn.ivfTopK(vecs, vecs.filter($"vec_id" === 3L), cents,
      "vec_id", "embedding", k = 5, nprobe = 1)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(top.map(_._1) == Seq(5L, 1L))

    // nprobe=2 probes both cells: the cross-cell neighbor 4 now appears
    val top2 = Knn.ivfTopK(vecs, vecs.filter($"vec_id" === 3L), cents,
      "vec_id", "embedding", k = 5, nprobe = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(top2 == Set(1L, 2L, 4L, 5L))
  }

  test("decontamination: coverage vs benchmark shingle set, stop-gram cap") {
    import graft.operators.Decontaminate
    // bench 100: "a b c d" -> 3-gram set {"a b c", "b c d"}, bench_sz=2
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c d e"),   // shares both shingles -> coverage 1.0
      (2L, "z a b c z"),   // shares "a b c" only  -> coverage 0.5
      (3L, "q w e r t")    // zero overlap -> unrepresentable, absent
    ).toDF("doc_id", "text")
    val out = Decontaminate.ngramOverlap(corpus, bench, "doc_id", "text",
      n = 3, minCoverage = 0.4)
      .select($"doc_id", $"bench_id", $"shared", $"bench_sz", $"coverage")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 100L, 2L, 2L, 1.0), (2L, 100L, 1L, 2L, 0.5)))

    // threshold filters doc 2 out
    val strict = Decontaminate.ngramOverlap(corpus, bench, "doc_id", "text",
      n = 3, minCoverage = 0.75)
      .select($"doc_id").as[Long].collect().toSeq
    assert(strict == Seq(1L))

    // stop-gram cap: "a b c" occurs in 2 corpus docs; cap=1 drops it from
    // the join, so doc 2 (whose only shared shingle it was) disappears
    // and doc 1 undercounts to 1/2 (the documented estimator trade-off)
    val capped = Decontaminate.ngramOverlap(corpus, bench, "doc_id", "text",
      n = 3, minCoverage = 0.4, maxShingleDf = Some(1L))
      .select($"doc_id", $"shared", $"coverage")
      .as[(Long, Long, Double)].collect().toSet
    assert(capped == Set((1L, 1L, 0.5)))

    // zero threshold is a contract violation, not an empty result
    intercept[IllegalArgumentException] {
      Decontaminate.ngramOverlap(corpus, bench, "doc_id", "text",
        n = 3, minCoverage = 0.0)
    }
  }

  test("ivfRefine: one Lloyd step = element-wise mean of assigned vectors; " +
    "empty cells keep their seed; iters=0 is identity") {
    GraftFunctions.register(spark)
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.8f, 0.2f)),
      (2L, Array(0f, 1f)), (3L, Array(0.2f, 0.8f))
    ).toDF("vec_id", "embedding")
    val seeds = Seq((0L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("cid", "cvec")
    // the exact arithmetic the operator promises: float→double casts,
    // fold sum, one double→float rounding
    def mean2(a: Float, b: Float): Float =
      ((a.toDouble + b.toDouble) / 2).toFloat

    val same = Knn.ivfRefine(vecs, "vec_id", "embedding", seeds, iters = 0)
      .as[(Long, Array[Float])].collect().toMap
    assert(same.view.mapValues(_.toSeq).toMap ==
      Map(0L -> Seq(1f, 0f), 2L -> Seq(0f, 1f)))

    // vectors 0,1 assign to cell 0; vectors 2,3 to cell 2
    val refined = Knn.ivfRefine(vecs, "vec_id", "embedding", seeds, iters = 1)
      .as[(Long, Array[Float])].collect().toMap
    assert(refined(0L).toSeq == Seq(mean2(1f, 0.8f), mean2(0f, 0.2f)))
    assert(refined(2L).toSeq == Seq(mean2(0f, 0.2f), mean2(1f, 0.8f)))

    // a centroid that attracts nothing keeps its seed vector
    val withDead = seeds.unionByName(
      Seq((99L, Array(-1f, 0f))).toDF("cid", "cvec"))
    val r2 = Knn.ivfRefine(vecs, "vec_id", "embedding", withDead, iters = 1)
      .as[(Long, Array[Float])].collect().toMap
    assert(r2(99L).toSeq == Seq(-1f, 0f))
  }

  test("star contraction == hash-min labeling on random multi-component graphs") {
    val rnd = new scala.util.Random(31)
    // several components of varying shape: random extra edges on top of
    // spanning paths, plus isolated 2-cliques
    val edges = (0 until 6).flatMap { c =>
      val base = c * 40L
      val n = 10 + rnd.nextInt(25)
      val path = (1 until n).map(i => (base + i - 1, base + i))
      val extra = Seq.fill(n / 3)(
        (base + rnd.nextInt(n), base + rnd.nextInt(n))).filter(e => e._1 != e._2)
      path ++ extra
    }
    // plus a node whose ONLY edge is a self-loop: both formulations must
    // still label it (as its own component)
    val df = (edges :+ (997L, 997L)).toDF("id_a", "id_b")
    val hashMin = Dedup.connectedComponents(df, maxIter = 60)
      .as[(Long, Long)].collect().toMap
    val star = Dedup.connectedComponentsStar(df)
      .as[(Long, Long)].collect().toMap
    assert(star == hashMin)
    assert(star(997L) == 997L)
    assert(star.values.toSet.size == 7, "six components plus the loner")
  }

  test("star contraction resolves a deep chain hash-min's budget cannot") {
    // a 400-link duplicate chain: hash-min needs ~400 rounds (its default
    // budget refuses), star contraction is diameter-independent
    val chain = (1 until 400).map(i => (i.toLong - 1, i.toLong)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 25)
    }
    val labels = Dedup.connectedComponentsStar(chain)
      .as[(Long, Long)].collect()
    assert(labels.length == 400 && labels.forall(_._2 == 0L))
  }

  test("star contraction handles string ids and empty edge lists") {
    val df = Seq(("docB", "docA"), ("docC", "docB"), ("docZ", "docY"))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponentsStar(df)
      .as[(String, String)].collect().toMap
    assert(labels == Map("docA" -> "docA", "docB" -> "docA",
      "docC" -> "docA", "docY" -> "docY", "docZ" -> "docY"))
    val empty = Dedup.connectedComponentsStar(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(empty.isEmpty)
  }

  test("banded simhash near-dups == all-pairs verifier, without the " +
    "block-wide self-join") {
    val rnd = new scala.util.Random(11)
    // clustered hashes so Hamming-close pairs actually exist: a few seed
    // hashes plus noisy copies within (and beyond) the 8-bit ball
    val seeds = Seq.fill(6)(rnd.nextLong() & 0xFFFFFFFFL)
    val rows = (0 until 240).map { i =>
      val base = seeds(rnd.nextInt(seeds.length))
      val flips = rnd.nextInt(12) // 0..11 bit flips: straddles maxHamming=8
      val h = (0 until flips).foldLeft(base)((acc, _) =>
        acc ^ (1L << rnd.nextInt(32)))
      (i.toLong, h, s"blk${i % 3}")
    }
    val df = rows.toDF("id", "simhash", "block_src")

    // 64-bit/full-width-band edge: maxHamming=0 on bits=64 is exact-dup
    // detection; the single band mask must be -1L, not (1L<<64)-1 == 0
    // (which would degenerate to a block-wide all-pairs join)
    val dupes = Seq((1L, -42L, "b"), (2L, -42L, "b"), (3L, 7L, "b"))
      .toDF("id", "simhash", "block_src")
    val exact = Dedup.simHashNearDupsBanded(dupes, "id", $"block_src",
      maxHamming = 0, bits = 64)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(exact == Set((1L, 2L)))
    val allPairs = Dedup.simHashNearDups(df, "id", $"block_src", maxHamming = 8)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)]
      .collect().toSet
    val banded = Dedup.simHashNearDupsBanded(df, "id", $"block_src",
      maxHamming = 8, bits = 32)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)]
      .collect().toSet
    assert(allPairs.nonEmpty, "fixture must produce near-dup pairs")
    assert(banded == allPairs)

    // the plan's self-join key must include the band bits — equality on
    // the block alone would be the quadratic shape this operator retires
    val joins = Dedup.simHashNearDupsBanded(df, "id", $"block_src", 8)
      .queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
    val selfJoin = joins.filter(_.condition.exists(
      _.toString.contains("band_bits")))
    assert(selfJoin.nonEmpty,
      "banded candidate join must key on (band, band_bits)")
  }

  test("block verifiers fail fast when a block exceeds maxBlockSize") {
    val rows = Seq.tabulate(30) { i =>
      (i.toLong, i.toLong * 7919, if (i < 25) "big" else "small")
    }
    val df = rows.toDF("id", "simhash", "block_src")
    // within bound: identical result to the unguarded path
    val unguarded = Dedup.simHashNearDups(df, "id", $"block_src",
      maxHamming = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val guarded = Dedup.simHashNearDups(df, "id", $"block_src",
      maxHamming = 8, maxBlockSize = 25L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(guarded == unguarded)
    // over bound: the job fails before the quadratic join, naming the op
    val err = intercept[Exception] {
      Dedup.simHashNearDups(df, "id", $"block_src", maxHamming = 8,
        maxBlockSize = 24L).collect()
    }
    assert(err.getMessage.contains("simHashNearDups") ||
      Option(err.getCause).exists(_.getMessage.contains("simHashNearDups")))
    // same contract on the cosine verifier
    val rnd = new scala.util.Random(11)
    val vecs = Seq.tabulate(20) { i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat()), "one")
    }.toDF("vec_id", "embedding", "label")
    val errC = intercept[Exception] {
      Dedup.cosineNearDups(vecs, "vec_id", "embedding", $"label",
        minCosine = 0.0, maxBlockSize = 10L).collect()
    }
    assert(errC.getMessage.contains("cosineNearDups") ||
      Option(errC.getCause).exists(_.getMessage.contains("cosineNearDups")))
  }

  test("LSH-fronted cosine near-dups = candidate pairs ∩ cosine threshold") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(23)
    val vecs = Seq.tabulate(120) { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val tau = 0.4
    // expected = all-pairs cosine >= tau, restricted to pairs sharing
    // any (htable, bucket) — computed here via the all-pairs verifier
    // (single block) and the bucket assignment, independently composed
    val all = Dedup.cosineNearDups(vecs, "vec_id", "embedding",
      lit(1), tau).select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val ids = Knn.lshBuckets(vecs, "vec_id", "embedding",
      tables = 2, planes = 4, dim = 16)
    val cand = ids.as("a").join(ids.as("b"),
        $"a.htable" === $"b.htable" && $"a.bucket" === $"b.bucket" &&
          $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id").as[(Long, Long)].collect().toSet
    val expected = all.intersect(cand)
    val got = Dedup.cosineNearDupsLsh(vecs, "vec_id", "embedding",
      tables = 2, planes = 4, minCosine = tau, dim = 16)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture must produce candidate near-dups")
    assert(got == expected)
    // the LSH front end must genuinely prune: candidates, and hence
    // results, are a strict subset of the all-pairs-at-threshold set
    assert(got.size < all.size,
      s"LSH candidates (${got.size}) should prune all-pairs (${all.size})")
  }

  test("lshBandPlan places the S-curve knee at the target threshold") {
    // hand-checked knees (1/b)^(1/r) for k = 16:
    //   b=16,r=1 → 0.0625 ; b=8,r=2 → 0.354 ; b=4,r=4 → 0.707 ;
    //   b=2,r=8 → 0.917 ; b=1,r=16 → 1.0
    assert(Dedup.lshBandPlan(0.7, 16) == ((4, 4)))
    assert(Dedup.lshBandPlan(0.9, 16) == ((2, 8)))
    assert(Dedup.lshBandPlan(0.3, 16) == ((8, 2)))
    // q32's production parameters fall out of the planner: 8 perms at a
    // 0.5-ish detection target → 4 bands of 2
    assert(Dedup.lshBandPlan(0.5, 8) == ((4, 2)))
    // collision probability: monotone in j, steeper than the diagonal
    // around the knee, and exact at the endpoints
    val p = (j: Double) => Dedup.lshCollisionProbability(j, 4, 4)
    assert(p(0.0) == 0.0 && p(1.0) == 1.0)
    val samples = (0 to 10).map(_ / 10.0).map(p)
    assert(samples == samples.sorted, "S-curve must be monotone")
    // a true near-dup (j=0.9) is nearly certain; a random pair (j=0.1)
    // is nearly never a candidate — the separation banding exists for
    assert(p(0.9) > 0.95 && p(0.1) < 0.01)
  }

  test("recallAtK counts per-query overlap and keeps zero-hit queries") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 99L), (2L, 98L), (3L, 20L))
      .toDF("query_id", "neighbor_id")
    val r = Knn.recallAtK(approx, exact)
      .select("query_id", "n_exact", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // query 2 found nothing right but keeps its row; query 3 has no
    // ground truth and must NOT appear (recall is defined over exact)
    assert(r.toSeq == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 0L, 0.0)))
  }
}
