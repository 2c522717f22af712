package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

/** Unigram-LM (SentencePiece-style) tokenizer: Viterbi segmentation
  * kernel semantics and EM training.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def seg(word: String,
                  table: Seq[(String, Double)]): Option[(Seq[String], Int)] =
    Unigram.segmentWords(Seq((word + " x", 1)).toDF("text", "n"), "text",
      table ++ Seq("x" -> -1.0))
      .filter(col("word") === word)
      .collect().headOption
      .map(r => (r.getSeq[String](2), r.getInt(3)))

  test("Viterbi picks the max-score segmentation") {
    val table = Seq("t" -> -4.5, "h" -> -4.5, "i" -> -4.5, "n" -> -4.5,
      "g" -> -4.5, "th" -> -2.5, "in" -> -2.4, "ing" -> -3.0)
    // th+ing (-5.5) beats th+in+g (-9.4) and every char split (-22.5)
    assert(seg("thing", table).contains((Seq("th", "ing"), 2)))
  }

  test("equal scores tie to FEWER pieces, then a LONGER final piece") {
    // 'ab' (-2.0) vs 'a'+'b' (-2.0): same score, one piece wins
    assert(seg("ab", Seq("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0))
      .contains((Seq("ab"), 1)))
    // a+bc (-3.0, final len 2) vs ab+c (-3.0, final len 1): same score,
    // same piece count — the longer FINAL piece wins the last DP cell
    assert(seg("abc", Seq("a" -> -1.0, "c" -> -1.0,
      "ab" -> -2.0, "bc" -> -2.0)).contains((Seq("a", "bc"), 2)))
  }

  test("words no piece path covers are dropped; logprob is the path sum") {
    val out = Unigram.segmentWords(
      Seq(("aba zq", 1)).toDF("text", "n"), "text",
      Seq("a" -> -1.5, "b" -> -2.0)) // no 'z'/'q' pieces
      .collect().map(r => r.getString(0) ->
        (r.getSeq[String](2), r.getDouble(4))).toMap
    assert(out.keySet == Set("aba"), s"got ${out.keySet}")
    assert(out("aba")._1 == Seq("a", "b", "a"))
    assert(math.abs(out("aba")._2 - (-1.5 - 2.0 - 1.5)) < 1e-12)
  }

  test("EM learns frequent substrings as pieces and keeps full coverage") {
    // 'ing' dominates the corpus; chars stay for coverage of rare words
    val docs = Seq(
      "running singing ringing winging",
      "running singing ringing pinging",
      "running singing bringing zap").toDF("text")
    val table = Unigram.learnUnigram(docs, "text", vocabSize = 60,
      iters = 2, maxPieceLen = 4, seedCandidates = 32)
    val pieces = table.map(_._1).toSet
    val alphabet = docs.as[String].collect().flatMap(_.split(" "))
      .flatMap(_.toCharArray).map(_.toString).toSet
    assert(alphabet.subsetOf(pieces),
      s"single chars must survive: ${alphabet -- pieces}")
    assert(pieces.exists(p => p.length >= 3 && p.contains("ing")),
      s"a frequent 'ing'-bearing piece should be learned: $pieces")
    // the learned table tokenizes the corpus into FEWER pieces than the
    // char-only baseline — the point of subword learning
    val charTable = alphabet.toSeq.sorted.map(_ -> -4.0)
    def totalTokens(t: Seq[(String, Double)]): Long =
      Unigram.segmentWords(docs, "text", t)
        .agg(sum(col("freq") * col("n_pieces"))).head().getLong(0)
    assert(totalTokens(table) < totalTokens(charTable),
      "learned table must beat the char baseline")
    // EM re-estimation is a proper distribution: exp(lp) sums to ≤ 1
    // over the surviving table (coverage floors are normalized in;
    // the post-EM prune can only remove mass)
    val mass = table.map { case (_, lp) => math.exp(lp) }.sum
    assert(mass <= 1.0 + 1e-9, s"probability mass $mass > 1")
  }

  test("unigramTokenCounts joins the per-word DP back to documents") {
    val docs = Seq((1L, "thing thing ring"), (2L, "ring"))
      .toDF("doc_id", "text")
    val table = Seq("t" -> -4.5, "h" -> -4.5, "r" -> -4.5, "i" -> -4.5,
      "n" -> -4.5, "g" -> -4.5, "th" -> -2.5, "ing" -> -3.0)
    val out = Unigram.unigramTokenCounts(docs, "doc_id", "text", table)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // thing = th+ing (2), ring = r+ing (2)
    assert(out(1L) == (3L, 6L) && out(2L) == (1L, 2L), s"got $out")
  }
}
