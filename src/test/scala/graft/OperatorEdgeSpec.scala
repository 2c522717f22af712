package graft

import org.apache.spark.sql.functions._

import graft.corpus.Corpus
import graft.operators.Jaccard
import graft.format.ReferenceOutput

/** Unit tests per operator, derived from SURVEY §1.4 / FIXTURES §C —
  * each case targets a documented reference behavior (citations inline).
  */
class OperatorEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def parse(lines: String*) =
    Corpus.parse(lines.toDF("value"))

  test("F1/F2: empty, no-space and leading-space lines are dropped") {
    // DocumentSimilarityMapper.java:19-23 — trim; drop empty; drop
    // firstSpace <= 0 (note the line is trimmed BEFORE indexOf, so a
    // leading-space line parses after trim — ' Doc1 a b' becomes valid).
    val got = parse("", "   ", "Doc1", " Doc1 a b", "Doc2 x y").collect()
    assert(got.map(_.getString(0)).sorted.toSeq == Seq("Doc1", "Doc2"))
  }

  test("P1: docId is text before FIRST space, case preserved; body keeps rest") {
    val row = parse("DocX a b  c").head()
    assert(row.getString(0) == "DocX")
    assert(row.getString(1) == "a b  c")
  }

  test("P2: punctuation→space, digits kept, non-ASCII letters stripped, dedup") {
    // DocumentSimilarityMapper.java:82-88; 'Café déjà' → {caf, d, j}
    val toks = Jaccard.tokenized(parse("D1 Hello, WORLD!! hello x9 Café déjà"))
      .select("tokens").as[Seq[String]].head()
    assert(toks == Seq("hello", "world", "x9", "caf", "d", "j"))
  }

  test("empty-token docs are absent from sizes and never pair") {
    // DocumentSimilarityMapper.java:29-31
    val toks = Jaccard.tokenized(parse("D1 !!!", "D2 a b"))
    assert(toks.select("docId").as[String].collect().toSeq == Seq("D2"))
  }

  test("A1: size = unique token count (within-doc dupes collapse)") {
    val sizes = Jaccard.docSizes(Jaccard.tokenized(parse("D1 a a a b")))
    assert(sizes.as[(String, Long)].collect().toSeq == Seq(("D1", 2L)))
  }

  test("J2: pair key is byte-lexicographic — Document10 < Document2") {
    // DocumentSimilarityReducer.java:42-47
    val sims = Jaccard.allPairs(parse("Document2 a", "Document10 a"))
    val row = sims.select("docA", "docB").head()
    assert((row.getString(0), row.getString(1)) == ("Document10", "Document2"))
  }

  test("zero-intersection pairs are never emitted") {
    // DocumentSimilarityReducer.java:43-48
    val sims = Jaccard.allPairs(parse("D1 a", "D2 b"))
    assert(sims.count() == 0)
  }

  test("P3: jaccard = inter/(|A|+|B|-inter)") {
    val sims = Jaccard.allPairs(parse("D1 a b c", "D2 b c d"))
    val row = sims.head()
    assert(row.getAs[Long]("inter") == 2L)
    assert(math.abs(row.getAs[Double]("similarity") - 0.5) < 1e-12)
  }

  test("P4: output format matches reference layout incl. %.2f HALF_UP") {
    // 1/8 = 0.125 → "0.13" under HALF_UP (String.format semantics)
    val sims = Jaccard.allPairs(parse("D1 a x1 x2 x3 x4", "D2 a y1 y2 y3 y4"))
    // inter=1, sizes 5,5 → union 9 → 0.111... → 0.11
    assert(ReferenceOutput.collectSorted(sims).toSeq ==
      Seq("D1, D2\tSimilarity: 0.11"))
    val half = spark.range(1).select(
      format_string("%.2f", lit(0.125)).as("v")).as[String].head()
    assert(half == "0.13", "format_string must round HALF_UP like String.format")
  }

  test("duplicate doc pair has similarity 1.00") {
    val sims = Jaccard.allPairs(parse("D1 a b c", "D2 c b a a"))
    assert(ReferenceOutput.collectSorted(sims).toSeq ==
      Seq("D1, D2\tSimilarity: 1.00"))
  }

  test("df-pruning drops hot words (opt-in, changes results)") {
    val docs = parse("D1 hot a", "D2 hot b", "D3 hot a")
    val exact = Jaccard.allPairs(docs)
    val pruned = Jaccard.allPairs(docs, maxDocFrequency = Some(2))
    assert(exact.count() == 3)   // all pairs share 'hot'
    assert(pruned.count() == 1)  // only D1-D3 share 'a'
  }

  test("G1: posting lists gather sorted distinct docIds per word") {
    val posts = Jaccard.postings(Jaccard.tokenized(
      parse("D2 a b", "D1 a", "D3 a a")))
    val lists = Jaccard.postingLists(posts)
      .as[(String, Seq[String])].collect().toMap
    assert(lists("a") == Seq("D1", "D2", "D3"))
    assert(lists("b") == Seq("D2"))
  }

  test("topKNeighbors ranks both orientations per doc") {
    val sims = Jaccard.allPairs(parse("D1 a b", "D2 a b", "D3 a z"))
    val top1 = Jaccard.topKNeighbors(sims, 1)
      .select("doc", "neighbor").as[(String, String)].collect().toMap
    assert(top1("D1") == "D2" && top1("D2") == "D1")
  }

  test("TopK.perKey matches the window formulation on random data") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // duplicate values force the id tie-break; two keys, 400 rows
    val rows = Seq.tabulate(400) { i =>
      (s"k${i % 2}", rnd.nextInt(40).toDouble, i.toLong)
    }
    val df = rows.toDF("key", "v", "id").repartition(9)
    val viaAgg = graft.operators.TopK
      .perKey(df, Seq("key"), "v", "id", k = 5)
      .select("key", "rank", "v", "id")
      .as[(String, Long, Double, Long)].collect().toSet
    val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
    val viaWindow = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("key", "rank", "v", "id")
      .as[(String, Long, Double, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    // fewer rows than k: every row comes back, still ranked
    val tiny = Seq(("a", 1.0, 1L), ("a", 2.0, 2L)).toDF("key", "v", "id")
    val got = graft.operators.TopK.perKey(tiny, Seq("key"), "v", "id", 5)
      .select("rank", "id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 1L)))
  }
}
