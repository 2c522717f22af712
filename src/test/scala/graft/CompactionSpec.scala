package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Jaccard

/** Incremental index compaction ([[Jaccard.compactIndex]]): exact
  * layout parity with the from-scratch [[Jaccard.dfOrderedSets]]
  * rebuild on the union — the q162 parity pattern — including each
  * doc's full `sorted_tokens` ORDER (df ascending, lexicographic
  * ties), across single batches, chained micro-batches, raw-duplicate
  * batch tokens, and empty batch docs; plus the untouched-rows-
  * ride-through claim (no re-rank for docs disjoint from the batch).
  */
/** Collect a dfOrderedSets-layout frame to a comparable map:
  * docId -> (sz, sorted_tokens verbatim) — the single notion of layout
  * parity shared by every spec that compares compacted vs rebuilt
  * indexes (CompactionSpec, StreamingSpec's ingest loop).
  */
private[graft] object IndexLayout {
  def of(df: DataFrame): Map[Long, (Long, Seq[String])] =
    df.collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getSeq[String](2).toList))
    }.toMap
}

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("docId", "text")

  private def layout(df: DataFrame): Map[Long, (Long, Seq[String])] =
    IndexLayout.of(df)

  private def assertParity(idxDocs: DataFrame, batchDocs: DataFrame): Unit = {
    val compacted = Jaccard.compactIndex(
      Jaccard.dfOrderedSets(Jaccard.tokenized(idxDocs)),
      Jaccard.tokenized(batchDocs))
    val rebuilt = Jaccard.dfOrderedSets(
      Jaccard.tokenized(idxDocs.unionByName(batchDocs)))
    assert(layout(compacted) === layout(rebuilt))
  }

  test("compacted layout equals the from-scratch rebuild on the union") {
    // shared words (df shifts re-rank old docs), batch-only words
    // (rank first after merge only in batch docs), index-only words,
    // and a df TIE broken lexicographically that the merge must keep
    val idx = docs(
      1L -> "spark scala join shuffle partition",
      2L -> "spark scala join broadcast",
      3L -> "quantum qubits decohere",
      4L -> "alpha beta gamma")
    val batch = docs(
      11L -> "spark shuffle novelword",
      12L -> "quantum qubits entangled fresh",
      13L -> "beta gamma delta")
    assertParity(idx, batch)
  }

  test("df shift re-orders an OLD doc's tokens exactly as the rebuild") {
    // index: 'rare' df=1 < 'com' df=2, so doc 1 sorts [rare, com].
    // batch adds two docs with 'rare' -> merged df(rare)=3 > df(com)=2:
    // doc 1 must re-rank to [com, rare] even though doc 1 isn't in the
    // batch — the affected-doc semi-join must catch it
    val idx = docs(1L -> "rare com", 2L -> "com other")
    val batch = docs(11L -> "rare x", 12L -> "rare y")
    assertParity(idx, batch)
    val compacted = layout(Jaccard.compactIndex(
      Jaccard.dfOrderedSets(Jaccard.tokenized(idx)),
      Jaccard.tokenized(batch)))
    assert(compacted(1L)._2 === List("com", "rare"))
  }

  test("chained micro-batches equal one rebuild on the full union") {
    val idx = docs(
      1L -> "spark scala join shuffle",
      2L -> "quantum qubits decohere")
    val b1 = docs(11L -> "spark shuffle first", 12L -> "totally new words")
    val b2 = docs(21L -> "scala qubits second", 22L -> "spark new again")
    val step1 = Jaccard.compactIndex(
      Jaccard.dfOrderedSets(Jaccard.tokenized(idx)), Jaccard.tokenized(b1))
    val step2 = Jaccard.compactIndex(step1, Jaccard.tokenized(b2))
    val rebuilt = Jaccard.dfOrderedSets(Jaccard.tokenized(
      idx.unionByName(b1).unionByName(b2)))
    assert(layout(step2) === layout(rebuilt))
  }

  test("raw duplicate batch tokens and empty batch docs are handled") {
    val idx = docs(1L -> "spark scala join")
    // batch tokens arrive as raw repeat-bearing arrays; tokenized()
    // dedups, but compactIndex must also accept hand-built raw arrays
    val rawBatch = Seq(
      (11L, Seq("spark", "spark", "new", "new", "spark")),
      (12L, Seq.empty[String])).toDF("docId", "tokens")
    val compacted = Jaccard.compactIndex(
      Jaccard.dfOrderedSets(Jaccard.tokenized(idx)), rawBatch)
    val rebuilt = Jaccard.dfOrderedSets(
      Jaccard.tokenized(idx.unionByName(docs(11L -> "spark new"))))
    assert(layout(compacted) === layout(rebuilt))
    assert(!layout(compacted).contains(12L), "empty batch doc must drop")
  }

  test("compaction parity holds on seeded random corpora and splits") {
    val rnd = new scala.util.Random(6190)
    val vocab = (1 to 25).map(i => s"tok$i")
    for (trial <- 1 to 3) {
      val rows = (1L to 60L).map { id =>
        val n = 1 + rnd.nextInt(8)
        (id + trial * 1000L) -> rnd.shuffle(vocab).take(n).mkString(" ")
      }
      val split = 10 + rnd.nextInt(40)
      val (idxRows, batchRows) = rows.splitAt(split)
      assertParity(docs(idxRows: _*), docs(batchRows: _*))
    }
  }

  test("posted form equals the set-form entry point") {
    val idx = docs(
      1L -> "spark scala join shuffle",
      2L -> "quantum qubits decohere")
    val batch = docs(11L -> "spark qubits crossover")
    val setForm = Jaccard.dfOrderedSets(Jaccard.tokenized(idx))
      .localCheckpoint()
    val viaSet = Jaccard.compactIndex(setForm, Jaccard.tokenized(batch))
    val viaPosted = Jaccard.compactIndexPosted(setForm,
      Jaccard.indexPostings(setForm).localCheckpoint(),
      Jaccard.tokenized(batch))
    assert(layout(viaSet) === layout(viaPosted))
  }

  private def assertDeleteParity(corpus: DataFrame,
                                 deleteIds: Seq[Long]): Unit = {
    val compacted = Jaccard.compactIndexDeleted(
      Jaccard.dfOrderedSets(Jaccard.tokenized(corpus)),
      deleteIds.toDF("docId"))
    val rebuilt = Jaccard.dfOrderedSets(Jaccard.tokenized(
      corpus.filter(!col("docId").isin(deleteIds: _*))))
    assert(layout(compacted) === layout(rebuilt))
  }

  test("deletion compaction equals the rebuild on the survivors") {
    // a sole-owner word vanishing with its doc, shared words shifting
    // survivor ranks, a df tie re-broken lexicographically, and an
    // untouched doc riding through
    val corpus = docs(
      1L -> "spark scala join shuffle partition",
      2L -> "spark scala join broadcast",
      3L -> "quantum qubits decohere",
      4L -> "alpha beta gamma",
      5L -> "spark shuffle solo")
    assertDeleteParity(corpus, Seq(2L, 3L))
  }

  test("df shrink re-orders a SURVIVOR's tokens exactly as the rebuild") {
    // df(com)=3 > df(rare)=2 before; deleting docs 3 and 4 leaves
    // df(com)=1 = df(rare)... doc 1 must re-rank even though doc 1
    // itself is untouched by the deletion
    val corpus = docs(
      1L -> "rare com",
      2L -> "rare other",
      3L -> "com x",
      4L -> "com y")
    assertDeleteParity(corpus, Seq(3L, 4L))
    val compacted = layout(Jaccard.compactIndexDeleted(
      Jaccard.dfOrderedSets(Jaccard.tokenized(corpus)),
      Seq(3L, 4L).toDF("docId")))
    // merged df: com 1, rare 2 -> doc 1 sorts [com, rare] (was the
    // other way: com 3 > rare 2 -> [rare, com])
    assert(compacted(1L)._2 === List("com", "rare"))
  }

  test("deleting unknown ids is a no-op; deleting all docs empties") {
    val corpus = docs(1L -> "spark scala", 2L -> "quantum qubits")
    assertDeleteParity(corpus, Seq(99L))
    val all = Jaccard.compactIndexDeleted(
      Jaccard.dfOrderedSets(Jaccard.tokenized(corpus)),
      Seq(1L, 2L, 99L).toDF("docId"))
    assert(all.count() === 0)
  }

  test("append then delete chains equal one rebuild on the net corpus") {
    val idx = docs(
      1L -> "spark scala join shuffle",
      2L -> "quantum qubits decohere",
      3L -> "alpha beta spark")
    val batch = docs(11L -> "spark qubits fresh", 12L -> "beta gamma")
    val step1 = Jaccard.compactIndex(
      Jaccard.dfOrderedSets(Jaccard.tokenized(idx)), Jaccard.tokenized(batch))
    val step2 = Jaccard.compactIndexDeleted(step1.localCheckpoint(),
      Seq(1L, 12L).toDF("docId"))
    val rebuilt = Jaccard.dfOrderedSets(Jaccard.tokenized(
      idx.unionByName(batch).filter(!col("docId").isin(1L, 12L))))
    assert(layout(step2) === layout(rebuilt))
  }

  test("deletion parity holds on seeded random corpora and delete sets") {
    val rnd = new scala.util.Random(1519)
    val vocab = (1 to 25).map(i => s"tok$i")
    for (trial <- 1 to 3) {
      val rows = (1L to 60L).map { id =>
        val n = 1 + rnd.nextInt(8)
        (id + trial * 1000L) -> rnd.shuffle(vocab).take(n).mkString(" ")
      }
      val dels = rnd.shuffle(rows.map(_._1)).take(5 + rnd.nextInt(20))
      assertDeleteParity(docs(rows: _*), dels)
    }
  }

  test("deletion: posted form equals the set-form entry point") {
    val corpus = docs(
      1L -> "spark scala join shuffle",
      2L -> "quantum qubits decohere",
      3L -> "spark qubits crossover")
    val setForm = Jaccard.dfOrderedSets(Jaccard.tokenized(corpus))
      .localCheckpoint()
    val del = Seq(3L).toDF("docId")
    val viaSet = Jaccard.compactIndexDeleted(setForm, del)
    val viaPosted = Jaccard.compactIndexDeletedPosted(setForm,
      Jaccard.indexPostings(setForm).localCheckpoint(), del)
    assert(layout(viaSet) === layout(viaPosted))
    // survivors disjoint from the deleted vocabulary ride an anti-join
    val plan = viaSet.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"untouched rows must ride an anti-join, got:\n$plan")
  }

  test("docs disjoint from the batch ride through the anti-join branch") {
    // behavioral pin of the untouched path: with a batch vocabulary
    // disjoint from doc 2's tokens, doc 2's row must come out VERBATIM
    // (same object-level layout), and the plan must contain the
    // LeftAnti join the ride-through claim rests on
    val idx = docs(
      1L -> "spark scala join",
      2L -> "quantum qubits decohere")
    val batch = docs(11L -> "spark new arrival")
    val compacted = Jaccard.compactIndex(
      Jaccard.dfOrderedSets(Jaccard.tokenized(idx)),
      Jaccard.tokenized(batch))
    assertParity(idx, batch)
    val plan = compacted.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"untouched rows must ride an anti-join, got:\n$plan")
    // the compacted output's matches behave like the rebuilt index's
    val probe = Jaccard.tokenized(docs(31L -> "quantum qubits decohere"))
    val viaCompacted = Jaccard.thresholdMatches(probe, compacted, 0.9)
      .select("docId", "matchId").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet
    assert(viaCompacted === Set((31L, 2L)))
  }
}
