package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Fuzzy, Retrieval}

/** [[graft.operators.Fuzzy]] — the SymSpell deletion-neighborhood
  * equi-join against a brute-force plain-Scala reference, plus the
  * correction and retrieval compositions.
  */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletion-neighborhood join equals brute-force levenshtein <= 1") {
    // random short words over a 4-letter alphabet: dense ed-1
    // neighborhoods, repeated characters, length-1 words — the shapes
    // that break an incomplete variant generation
    val rnd = new scala.util.Random(208)
    def w(): String =
      Seq.fill(1 + rnd.nextInt(5))("abcd" (rnd.nextInt(4))).mkString
    val vocabWords = Seq.fill(120)(w()).distinct
    val termWords = Seq.fill(40)(w()).distinct
    val vocab = vocabWords.zipWithIndex
      .map { case (s, i) => (s, (i % 7 + 1).toLong) }.toDF("word", "df")
    val terms = termWords.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("queryId", "word")
    val got = Fuzzy.fuzzyMatchTerms(vocab, terms).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(4))).toSet
    val dfOf = vocabWords.zipWithIndex
      .map { case (s, i) => s -> (i % 7 + 1).toLong }.toMap
    val want = (for {
      (qid, t) <- termWords.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      v <- vocabWords if lev(t, v) <= 1
    } yield (qid, t, v, lev(t, v).toLong)).toSet
    assert(got === want)
    assert(want.exists(_._4 == 1L), "fixture produced no ed-1 pair")
    // the rank order: dist asc, df desc, word asc per term
    val ranked = Fuzzy.fuzzyMatchTerms(vocab, terms).collect()
      .map(r => (r.getLong(0), r.getString(1),
        (r.getLong(4), -r.getLong(3), r.getString(2)), r.getLong(5)))
      .groupBy(x => (x._1, x._2))
    for ((_, rows) <- ranked)
      assert(rows.sortBy(_._4).map(_._3).toSeq ===
        rows.map(_._3).toSeq.sorted, s"rank order broken in $rows")
  }

  test("deletion-neighborhood join equals brute-force levenshtein <= 2") {
    // the d = 2 completeness claim (each substitution deletes one
    // char from BOTH sides): transpositions ("ab" vs "ba"), double
    // substitutions, insert+delete mixes — all must surface through
    // the delete-<=2 equi-join and rank (dist, df desc, word)
    val rnd = new scala.util.Random(226)
    def w(): String =
      Seq.fill(1 + rnd.nextInt(6))("abcd" (rnd.nextInt(4))).mkString
    val vocabWords = Seq.fill(120)(w()).distinct
    val termWords = Seq.fill(40)(w()).distinct
    val vocab = vocabWords.zipWithIndex
      .map { case (s, i) => (s, (i % 7 + 1).toLong) }.toDF("word", "df")
    val terms = termWords.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("queryId", "word")
    val got = Fuzzy.fuzzyMatchTerms(vocab, terms, maxEdit = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(4))).toSet
    val want = (for {
      (qid, t) <- termWords.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      v <- vocabWords if lev(t, v) <= 2
    } yield (qid, t, v, lev(t, v).toLong)).toSet
    assert(got === want)
    assert(want.exists(_._4 == 2L), "fixture produced no ed-2 pair")
    // a deeper persisted layout serves a shallower probe: variants
    // built at 2, probe at maxEdit = 1 — extra vocab variants add
    // only false positives, which the verify removes
    val vv2 = Fuzzy.deletionVariants(vocab, maxEdit = 2).localCheckpoint()
    val got1 = Fuzzy.fuzzyMatchTerms(vocab, terms,
      vocabVariants = Some(vv2)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(4))).toSet
    assert(got1 === want.filter(_._4 <= 1L))
  }

  test("length-1 words meet through the empty variant") {
    val vocab = Seq(("a", 3L), ("b", 2L), ("xy", 1L)).toDF("word", "df")
    val terms = Seq((1L, "c")).toDF("queryId", "word")
    val got = Fuzzy.fuzzyMatchTerms(vocab, terms).collect()
      .map(r => (r.getString(2), r.getLong(5))).toSet
    // any two single chars are one substitution apart; "xy" is ed 2
    assert(got === Set(("a", 1L), ("b", 2L)))
  }

  test("corrected terms: OOV replaced by best df, collisions deduped") {
    val c = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "alpha beta delta"),
      (3L, "beta epsilon")).toDF("doc_id", "text")
    val tf = Retrieval.termFrequencies(c, "doc_id", "text")
      .localCheckpoint()
    val vocab = Retrieval.dfTable(tf).localCheckpoint()
    // "bet" is OOV, ed-1 of "beta" (df 3); "alpha" in-vocab; "alpha"
    // ALSO arises as the correction of OOV "alpho" -> dedup to one row;
    // "qqqqq" has no neighbor -> drops
    val qs = Seq((9L, "alpha bet alpho qqqqq")).toDF("query_id", "text")
    val got = Fuzzy.correctedQueryTerms(vocab, qs, "query_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((9L, "alpha"), (9L, "beta")))
  }

  test("fuzzy top-k equals plain top-k over the corrected query") {
    val rnd = new scala.util.Random(209)
    val c = (1L to 50L).map { id =>
      id -> Seq.fill(6)(s"tok${15 / (rnd.nextInt(15) + 1)}").mkString(" ")
    }.toDF("doc_id", "text")
    val tf = Retrieval.termFrequencies(c, "doc_id", "text")
      .localCheckpoint()
    val dfT = Retrieval.dfTable(tf).localCheckpoint()
    val st = Retrieval.corpusStats(tf).localCheckpoint()
    // "tok" variants exist: misspell tok15 -> tk15 (delete), tok1 -> toq1
    // (substitute); the corrected query is the clean one
    val fuzzyQ = Seq((1L, "tk15 toq1")).toDF("query_id", "text")
    val cleanQ = Seq((1L, "tok15 tok1")).toDF("query_id", "text")
    def rows(d: DataFrame): Seq[(Long, Long, Double, Int)] =
      d.select(col("queryId"), col("docId"), col("score"),
        col("rank").cast("int")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSeq.sorted
    val viaFuzzy = rows(Fuzzy.bm25TopKFuzzy(tf, dfT, st, fuzzyQ,
      "query_id", "text", k = 5))
    val viaClean = rows(Retrieval.bm25TopK(
      Retrieval.bm25ScoresPrecomputed(tf, dfT, st, cleanQ,
        "query_id", "text"), 5))
    // corrections must have resolved to exactly the clean terms
    val corrected = Fuzzy.correctedQueryTerms(dfT, fuzzyQ,
      "query_id", "text").collect().map(_.getString(1)).toSet
    assert(corrected === Set("tok15", "tok1"), s"corrected=$corrected")
    assert(viaFuzzy === viaClean)
  }

  test("prefix expansion ranks by df, caps, and re-attaches query ids") {
    val vocab = Seq(("pre", 2L), ("prefix", 9L), ("press", 5L),
      ("prey", 5L), ("quiet", 7L)).toDF("word", "df")
    val qs = Seq((1L, "pre"), (2L, "pre"), (3L, "qu")).toDF(
      "queryId", "prefix")
    val got = Fuzzy.prefixMatchTerms(vocab, qs, maxExpansions = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(4))).toSet
    // df desc, word asc ties; "pre" itself matches; cap 3 drops "pre"
    // (df 2, rank 4); both query 1 and 2 get the same expansion
    val pre = Set(("prefix", 1L), ("press", 2L), ("prey", 3L))
    assert(got === (for ((w, r) <- pre; q <- Seq(1L, 2L))
      yield (q, "pre", w, r)).toSet + ((3L, "qu", "quiet", 1L)))
  }

  test("prefix top-k equals plain top-k over the expansion term set") {
    val rnd = new scala.util.Random(212)
    val c = (1L to 50L).map { id =>
      id -> Seq.fill(6)(s"tok${15 / (rnd.nextInt(15) + 1)}").mkString(" ")
    }.toDF("doc_id", "text")
    val tf = Retrieval.termFrequencies(c, "doc_id", "text")
      .localCheckpoint()
    val dfT = Retrieval.dfTable(tf).localCheckpoint()
    val st = Retrieval.corpusStats(tf).localCheckpoint()
    val qs = Seq((1L, "tok1")).toDF("queryId", "prefix")
    def rows(d: DataFrame) =
      d.select(col("queryId"), col("docId"), col("score"),
        col("rank").cast("int")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSeq.sorted
    val viaPrefix = rows(Fuzzy.bm25TopKPrefix(tf, dfT, st, qs,
      k = 5, maxExpansions = 100))
    val terms = Fuzzy.prefixMatchTerms(dfT, qs, maxExpansions = 100)
      .select(col("queryId"), col("word")).distinct()
      .withColumn("weight", lit(1.0)).localCheckpoint()
    val viaTerms = rows(Retrieval.bm25TopK(
      Retrieval.bm25ScoresWeighted(tf, dfT, st, terms), 5))
    assert(viaPrefix === viaTerms)
    assert(viaPrefix.nonEmpty)
    // tok1, tok10-tok15 all expand under 'tok1'
    assert(terms.count() >= 2)
  }

  test("a prebuilt variants table probes identically") {
    val vocab = Seq(("slow", 5L), ("row", 4L), ("snow", 3L))
      .toDF("word", "df")
    val terms = Seq((1L, "sow"), (2L, "slow")).toDF("queryId", "word")
    def rows(vv: Option[DataFrame]) =
      Fuzzy.fuzzyMatchTerms(vocab, terms, vv).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val prebuilt = Fuzzy.deletionVariants(vocab.select("word"))
      .localCheckpoint()
    assert(rows(Some(prebuilt)) === rows(None))
    assert(rows(None).nonEmpty)
  }

  test("fuzzy and prefix top-k are bitwise unchanged under weighted WAND") {
    val rnd = new scala.util.Random(227)
    val c = (1L to 60L).map { id =>
      id -> Seq.fill(6)(s"tok${15 / (rnd.nextInt(15) + 1)}").mkString(" ")
    }.toDF("doc_id", "text")
    val tf = Retrieval.termFrequencies(c, "doc_id", "text")
      .localCheckpoint()
    val dfT = Retrieval.dfTable(tf).localCheckpoint()
    val st = Retrieval.corpusStats(tf).localCheckpoint()
    def rows(d: DataFrame): Seq[(Long, Long, Double, Int)] =
      d.select(col("queryId"), col("docId"), col("score"),
        col("rank").cast("int")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSeq.sorted
    val fuzzyQ = Seq((1L, "tk15 toq1"), (2L, "tok2 tok7"))
      .toDF("query_id", "text")
    val prefQ = Seq((1L, "tok1"), (2L, "tok")).toDF("queryId", "prefix")
    val fuzzyPlain = rows(Fuzzy.bm25TopKFuzzy(tf, dfT, st, fuzzyQ,
      "query_id", "text", k = 5))
    val prefPlain = rows(Fuzzy.bm25TopKPrefix(tf, dfT, st, prefQ,
      k = 5, maxExpansions = 100))
    for (hd <- Seq(0L, 3L, 10L, 1000L);
         imp <- Seq(None, Some(Retrieval.impactStats(tf)))) {
      assert(rows(Fuzzy.bm25TopKFuzzy(tf, dfT, st, fuzzyQ,
        "query_id", "text", k = 5, wandHotDf = Some(hd),
        minWandDocs = 0L,
        impact = imp)) === fuzzyPlain, s"fuzzy hd=$hd") // bitwise
      assert(rows(Fuzzy.bm25TopKPrefix(tf, dfT, st, prefQ,
        k = 5, maxExpansions = 100, wandHotDf = Some(hd),
        minWandDocs = 0L,
        impact = imp)) === prefPlain, s"prefix hd=$hd") // bitwise
    }
  }
}
