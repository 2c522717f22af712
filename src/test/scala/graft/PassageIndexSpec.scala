package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Passages, Retrieval}

/** [[graft.operators.Passages]] — the persisted passage-index layout
  * and its append/delete lifecycle. The probe arithmetic itself is
  * oracle-gated (q203 fresh build, q235 compacted lifecycle); this
  * spec owns the table-level parity claims and the edges.
  */
class PassageIndexSpec extends SparkSpec {
  import spark.implicits._

  private def randDocs(ids: Range, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    ids.map { id =>
      id.toLong -> Seq.fill(6 + rnd.nextInt(60))(
        s"tok${24 / (rnd.nextInt(24) + 1)}").mkString(" ")
    }.toDF("doc_id", "text")
  }

  private def layoutRows(l: Passages.PassageLayout)
      : (Set[String], Set[String], Set[String], Set[String]) = (
    l.tf.collect().map(_.toString).toSet,
    l.dfTab.collect().map(_.toString).toSet,
    l.stats.collect().map(_.toString).toSet,
    l.membership.collect().map(_.toString).toSet)

  test("append + delete compaction equals the fresh build, all four tables") {
    val base = randDocs(1 to 25, 7)
    val batch = randDocs(26 to 40, 8)
    val phantom = randDocs(900 to 906, 9)
    val built = Passages.passageIndex(base.unionByName(phantom),
      "doc_id", "text", width = 8, stride = 4)
    val appended = Passages.compactPassageIndex(built, batch,
      "doc_id", "text", width = 8, stride = 4)
    val fin = Passages.compactPassageIndexDeleted(appended,
      phantom.select(col("doc_id").as("docId")))
    val rebuilt = Passages.passageIndex(base.unionByName(batch),
      "doc_id", "text", width = 8, stride = 4)
    assert(layoutRows(fin) === layoutRows(rebuilt))
  }

  test("unknown delete ids are a no-op; deleting every doc empties") {
    val l = Passages.passageIndex(randDocs(1 to 10, 11),
      "doc_id", "text", width = 8, stride = 4)
    val noop = Passages.compactPassageIndexDeleted(l,
      Seq(999L).toDF("docId"))
    assert(layoutRows(noop) === layoutRows(l))
    val gone = Passages.compactPassageIndexDeleted(l,
      (1L to 10L).toDF("docId"))
    assert(gone.tf.count() === 0 && gone.membership.count() === 0)
    assert(gone.dfTab.count() === 0)
  }

  test("the layout probe equals the inline q203 chain bitwise") {
    val c = randDocs(1 to 30, 12)
    val l = Passages.passageIndex(c, "doc_id", "text",
      width = 8, stride = 4)
    val qs = Seq((100L, "tok1 tok24"), (101L, "tok12 tok8 tok3"))
      .toDF("query_id", "text")
    val viaLayout = Passages.maxPassageTopK(l, qs, "query_id", "text",
      k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val pass = Chunking.tokenPassages(c, "doc_id", "text", 8, 4)
    val tf = Retrieval.termFrequencies(pass, "passageId", "text")
    val viaInline = Retrieval.bm25TopK(
      Retrieval.maxPassageScores(
        Retrieval.bm25ScoresIndexed(tf, qs, "query_id", "text"),
        pass.select("passageId", "docId")), 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    assert(viaLayout === viaInline) // bitwise
  }

  test("the disjoint-ingest guard trips on a reused doc id") {
    val l = Passages.passageIndex(randDocs(1 to 5, 13),
      "doc_id", "text", width = 8, stride = 4)
    val dup = Passages.compactPassageIndex(l, randDocs(5 to 7, 14),
      "doc_id", "text", width = 8, stride = 4, assertDisjoint = true)
    val e = intercept[Exception](dup.tf.count())
    assert(e.getMessage != null)
  }

  test("MaxP WAND equals the unpruned probe bitwise at every hotDf") {
    val c = randDocs(1 to 40, 15)
    val l0 = Passages.passageIndex(c, "doc_id", "text",
      width = 8, stride = 4)
    val qs = Seq((100L, "tok1 tok24"), (101L, "tok12 tok8 tok3"),
      (102L, "tok24 tok24 tok6"), (103L, "zzz"))
      .toDF("query_id", "text")
    def topk(d: DataFrame): Set[(Long, Long, Double, Int)] =
      d.select("queryId", "docId", "score", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
    val want = topk(Passages.maxPassageTopK(l0, qs, "query_id", "text",
      k = 3))
    for (hd <- Seq(0L, 3L, 10L, 40L, 10000L);
         pruned <- Seq(false, true)) {
      val l = if (pruned) l0.copy(forward = Some(l0.tf),
        impact = Some(Retrieval.impactStats(l0.tf))) else l0
      assert(topk(Passages.maxPassageTopKWand(l, qs, "query_id",
        "text", k = 3, hotDf = hd)) === want,
        s"hotDf=$hd pruning tables=$pruned") // bitwise
    }
  }

  test("theta routes at the DOC level, not the passage level") {
    // a query whose rare term surfaces MANY passages of one doc: the
    // passage-level kth score is high (all from that one doc) while
    // the doc-level kth is low/absent — a passage-level θ would call
    // the query safe; the doc-level θ must route it to the fallback
    // (theta null with < k candidate DOCS). 'rare' appears in every
    // passage of doc 1 only; 'hot' in every doc.
    val docs = ((1L, ("rare hot w1 w2 " * 8).trim) +:
      (2L to 30L).map(id => id -> s"hot filler$id x$id y$id z$id"))
      .toDF("doc_id", "text")
    val l = Passages.passageIndex(docs, "doc_id", "text",
      width = 4, stride = 2)
    val qs = Seq((900L, "rare hot")).toDF("query_id", "text")
    // df('rare') = the 15 passages of doc 1 (every width-4 window
    // holds a multiple-of-4 position); df('hot') adds one passage per
    // other doc (~44) — the cut must sit between them
    val st = Passages.maxPassageWandStats(l, qs, "query_id", "text",
      k = 3, hotDf = 20L).collect()
    assert(st.length === 1)
    val r = st(0)
    // candidates: many (query, passage) pairs, but ONE candidate doc
    assert(r.getAs[Long]("n_candidates") > 3L)
    assert(r.getAs[Any]("theta") == null) // < k candidate DOCS
    assert(!r.getAs[Boolean]("safe"))
    // ...and the fallback keeps the answer exact
    val want = Passages.maxPassageTopK(l, qs, "query_id", "text", k = 3)
      .collect().map(_.toString).toSet
    val got = Passages.maxPassageTopKWand(l, qs, "query_id", "text",
      k = 3, hotDf = 20L).collect().map(_.toString).toSet
    assert(got === want)
  }

  test("lifecycle maintains the pruning tables when present") {
    val base = randDocs(1 to 25, 16)
    val batch = randDocs(26 to 40, 17)
    val phantom = randDocs(900 to 906, 18)
    def withTables(l: Passages.PassageLayout) =
      l.copy(forward = Some(l.tf),
        impact = Some(Retrieval.impactStats(l.tf)))
    val built = withTables(Passages.passageIndex(
      base.unionByName(phantom), "doc_id", "text", 8, 4))
    val appended = Passages.compactPassageIndex(built,
      Passages.passageIndex(batch, "doc_id", "text", 8, 4),
      assertDisjoint = false)
    val fin = Passages.compactPassageIndexDeleted(appended,
      phantom.select(col("doc_id").as("docId")))
    val rebuilt = Passages.passageIndex(base.unionByName(batch),
      "doc_id", "text", 8, 4)
    def rows(d: DataFrame) = d.collect().map(_.toString).toSet
    assert(rows(fin.impact.get) ===
      rows(Retrieval.impactStats(rebuilt.tf)))
    assert(rows(fin.forward.get) === rows(rebuilt.tf))
  }

  test("routed MaxP picks branches without changing answers") {
    val c = randDocs(1 to 30, 19)
    val l = Passages.passageIndex(c, "doc_id", "text", 8, 4)
    val qs = Seq((100L, "tok1 tok24"), (101L, "tok12 tok8"))
      .toDF("query_id", "text")
    def topk(d: DataFrame) = d.collect().map(_.toString).toSet
    val want = topk(Passages.maxPassageTopK(l, qs, "query_id", "text",
      k = 3))
    // passage count >> 1 -> the WAND branch; < huge -> unpruned
    assert(topk(Passages.maxPassageTopKRouted(l, qs, "query_id",
      "text", k = 3, minWandDocs = 1)) === want)
    assert(topk(Passages.maxPassageTopKRouted(l, qs, "query_id",
      "text", k = 3, minWandDocs = 1000000L)) === want)
  }
}
