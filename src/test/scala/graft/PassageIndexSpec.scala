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
}
