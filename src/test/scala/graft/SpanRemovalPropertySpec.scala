package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Chunking

/** Property-based oracles for the span-removal rewrites: for random
  * small corpora the engine must equal a direct in-memory reference
  * implementation of the same published semantics — cross-doc
  * ExactSubstr coverage ([[Chunking.dropDuplicatedSpans]]) and
  * within-doc first-seen coverage ([[Chunking.dropRepeatedSpans]]).
  */
class SpanRemovalPropertySpec extends SparkSpec {
  import spark.implicits._

  // a small vocabulary forces real shingle collisions at tiny sizes
  private val word =
    Gen.oneOf("red", "blue", "green", "jade", "onyx", "ruby7", "opal0")
  private val docGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word))
  private val corpusGen = Gen.chooseNum(1, 6)
    .flatMap(n => Gen.listOfN(n, docGen))
  private val widthGen = Gen.chooseNum(1, 4)

  private def runs(ws: Seq[String], w: Int): Seq[(Int, Seq[String])] =
    if (ws.length < w) Seq.empty
    else (0 to ws.length - w).map(p => p -> ws.slice(p, p + w))

  /** Reference cross-doc removal: positions covered by any width-run
    * whose content occurs in more than maxDf DISTINCT docs.
    */
  private def refDropDuplicated(corpus: Seq[(Long, Seq[String])], w: Int,
                                maxDf: Long): Map[Long, (Seq[String], Long)] = {
    val df = corpus
      .flatMap { case (id, ws) => runs(ws, w).map(r => (r._2, id)) }
      .groupBy(_._1).map { case (run, xs) => run -> xs.map(_._2).distinct.size }
    val hot = df.filter(_._2 > maxDf).keySet
    corpus.map { case (id, ws) =>
      val covered = runs(ws, w).filter(r => hot(r._2))
        .flatMap { case (p, _) => p until p + w }.toSet
      val kept = ws.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      id -> (kept, (ws.length - kept.length).toLong)
    }.toMap
  }

  /** Reference within-doc removal: positions covered by any width-run
    * already seen at a strictly earlier start in the SAME doc.
    */
  private def refDropRepeated(ws: Seq[String],
                              w: Int): (Seq[String], Long, Long) = {
    val rs = runs(ws, w)
    val repeatStarts = rs.zipWithIndex.collect {
      case ((p, run), i) if rs.take(i).exists(_._2 == run) => p
    }
    val covered = repeatStarts.flatMap(p => p until p + w).toSet
    val kept = ws.zipWithIndex.collect { case (t, i) if !covered(i) => t }
    (kept, (ws.length - kept.length).toLong, repeatStarts.length.toLong)
  }

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }

  test("dropDuplicatedSpans equals the in-memory coverage reference") {
    check(Prop.forAll(corpusGen, widthGen, Gen.chooseNum(1L, 2L)) {
      (docs, w, maxDf) =>
        val corpus = docs.zipWithIndex
          .map { case (ws, i) => (i.toLong, ws) }
          .filter(_._2.nonEmpty)
        val expected = refDropDuplicated(corpus, w, maxDf)
        val got = Chunking.dropDuplicatedSpans(
          corpus.map { case (id, ws) => (id, ws.mkString(" ")) }
            .toDF("doc_id", "text"),
          "doc_id", "text", width = w, maxDf = maxDf)
          .select("doc_id", "clean_text", "n_dropped_tokens")
          .as[(Long, String, Long)].collect()
          .map { case (id, t, d) =>
            id -> ((if (t.isEmpty) Seq.empty[String]
                    else t.split(" ").toSeq, d)) }
          .toMap
        got == expected
    })
  }

  test("dropRepeatedSpans equals the in-memory first-seen reference") {
    check(Prop.forAll(docGen.suchThat(_.nonEmpty), widthGen) { (ws, w) =>
      val (kept, dropped, starts) = refDropRepeated(ws, w)
      val got = Chunking.dropRepeatedSpans(
        Seq((1L, ws.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", width = w)
        .select("clean_text", "n_dropped_tokens", "n_repeat_starts")
        .as[(String, Long, Long)].head()
      val gotKept =
        if (got._1.isEmpty) Seq.empty[String] else got._1.split(" ").toSeq
      gotKept == kept && got._2 == dropped && got._3 == starts
    })
  }

  test("span removal structural invariants hold on random docs") {
    check(Prop.forAll(docGen.suchThat(_.nonEmpty), widthGen) { (ws, w) =>
      val got = Chunking.dropRepeatedSpans(
        Seq((1L, ws.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", width = w)
        .select("clean_text", "n_kept_tokens", "n_dropped_tokens")
        .as[(String, Long, Long)].head()
      val kept =
        if (got._1.isEmpty) Seq.empty[String] else got._1.split(" ").toSeq
      // kept is a subsequence of the input, counts are consistent, and
      // a doc shorter than the width is never touched
      def isSubseq(a: Seq[String], b: Seq[String]): Boolean = {
        var i = 0
        b.foreach { t => if (i < a.length && a(i) == t) i += 1 }
        i == a.length
      }
      isSubseq(kept, ws) &&
        got._2 + got._3 == ws.length &&
        (ws.length >= w || kept == ws)
    })
  }
}
