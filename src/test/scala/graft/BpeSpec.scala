package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Dedup}

/** BPE tokenizer training (pair statistics + iterative merge learning)
  * and incremental LSH dedup.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("initialPairStats counts within-word multiplicity times word freq") {
    // "aaab" twice, "aab" once:
    //   aaab (freq 2): (a,a)×2, (a,b)×1  →  (a,a)+=4, (a,b)+=2
    //   aab  (freq 1): (a,a)×1, (a,b)×1  →  (a,a)+=1, (a,b)+=1
    val docs = Seq((1L, "aaab aaab"), (2L, "aab")).toDF("doc_id", "text")
    val m = Bpe.initialPairStats(docs, "text")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(m == Map(("a", "a") -> 5L, ("a", "b") -> 3L))
  }

  test("single-character words yield no pairs; empty docs contribute nothing") {
    val docs = Seq((1L, "a b c a"), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(Bpe.initialPairStats(docs, "text").count() == 0L)
  }

  test("learnMerges reproduces hand-computed merges with left-to-right " +
    "non-overlapping rewrite and ascending tiebreak") {
    // vocab: aaab×2, aab×1
    // merge 1: (a,a) count 5 → aaab=[aa,a,b], aab=[aa,b]
    // merge 2: (aa,a)=2 ties (a,b)=2 → tiebreak asc picks (a,b)
    //          → aaab=[aa,ab], aab unchanged
    // merge 3: (aa,ab)=2 beats (aa,b)=1
    // merge 4: (aa,b)=1 (last pair standing)
    // then the pair table is empty → learner stops early
    val docs = Seq((1L, "aaab aaab"), (2L, "aab")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 10)
      .orderBy("merge_rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(merges == Seq(
      (1, "a", "a", 5L),
      (2, "a", "b", 2L),
      (3, "aa", "ab", 2L),
      (4, "aa", "b", 1L)))
  }

  test("learnMerges on an empty corpus returns an empty merge table") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Bpe.learnMerges(docs, "text", numMerges = 3).count() == 0L)
  }

  test("encodeWords applies fixed merges in rank order, reusing " +
    "earlier merges' products") {
    // merges (a,n) (s,c) (sc,an): "scan" → [s,c,an] → [sc,an] → [scan];
    // "cans" exercises partial application: → [c,an,s] and stops
    val docs = Seq((1L, "scan cans scan")).toDF("doc_id", "text")
    val enc = Bpe.encodeWords(docs, "text",
      Seq(("a", "n"), ("s", "c"), ("sc", "an")))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getSeq[String](2).toList)).toSet
    assert(enc == Set(
      ("scan", 2L, List("scan")),
      ("cans", 1L, List("c", "an", "s"))))
  }

  test("encoding with LEARNED merges collapses every training word to " +
    "one symbol, and pieces always reconstruct the word") {
    val docs = Seq((1L, "aaab aaab"), (2L, "aab"), (3L, "zq aaab"))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 10)
      .orderBy("merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Bpe.encodeWords(docs, "text", merges)
      .select(col("word"), concat_ws("", col("pieces")).as("glued"),
        col("n_pieces"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    // reconstruction invariant: concatenating the pieces is the word
    assert(enc.forall { case (w, glued, _) => glued == w })
    // BPE trained to exhaustion on its own corpus encodes every
    // training word (aaab, aab — zq only has 1 pair, learned last or
    // not at all depending on counts; assert the two multi-pair words)
    val n = enc.map { case (w, _, np) => w -> np }.toMap
    assert(n("aaab") == 1 && n("aab") == 1)
  }

  test("bpeTokenCounts sums per-occurrence piece counts") {
    // merges (a,n) (s,c) (sc,an): scan→1 piece, cans→3, the→3 (chars)
    val docs = Seq((1L, "scan cans scan"), (2L, "the"), (3L, "   "))
      .toDF("doc_id", "text")
    val r = Bpe.bpeTokenCounts(docs, "doc_id", "text",
      Seq(("a", "n"), ("s", "c"), ("sc", "an")))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    // doc 1: 3 words, pieces 1+3+1; doc 2: 1 word, 3 pieces; doc 3 empty
    assert(r == Set((1L, 3L, 5L), (2L, 1L, 3L)))
  }

  test("incrementalLshMatches finds cross-side dups and never " +
    "batch×batch or index×index pairs") {
    val same = "spark shuffles the partition table by hash key value"
    val other = "completely different words appear in this tiny document here"
    val batch = Seq((100L, same), (101L, other)).toDF("doc_id", "text")
    val index = Seq(
      (1L, same), // exact text twin of batch 100
      (2L, "unrelated index content nothing shared with anything else"),
      (3L, same)  // second twin — also an index-side dup of 1
    ).toDF("doc_id", "text")
    val m = Dedup.incrementalLshMatches(batch, index, "doc_id", "text",
      k = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // identical text ⇒ identical signature ⇒ all 4 bands collide
    assert(m.toSet == Set((100L, 1L, 4L), (100L, 3L, 4L)))
    // index-side dup pair (1,3) must NOT appear: output is strictly
    // batch→index
    assert(m.forall { case (b, _, _) => b >= 100L })
  }
}
