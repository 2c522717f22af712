package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextAnalysis, TextFunctions}
import graft.operators.{Bloom, CountMin, Dedup, Packing}

/** Repetition stats, chunk-level duplication, count-min sketch, and the
  * Bloom filter.
  */
class RepetitionSketchSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgramsAllOf keeps duplicates and emits len-n+1 grams") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "b")),
      (2L, Seq("x")),
      (3L, Seq.empty[String])
    ).toDF("id", "ws")
    val grams = df.select(col("id"),
      TextFunctions.wordNgramsAllOf(col("ws"), 2).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(grams(1L) == Seq("a b", "b a", "a b")) // duplicate bigram kept
    assert(grams(2L) == Seq.empty)                // shorter than n → none
    assert(grams(3L) == Seq.empty)
  }

  test("repetitionStats flags repeated n-grams and nulls short docs") {
    val docs = Seq(
      (1L, "spam spam spam spam"),    // one bigram repeated 3x
      (2L, "all words here differ"),  // no repeats
      (3L, "two words")               // bigram only, no trigram
    ).toDF("doc_id", "text")
    val stats = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect()
    // doc 1: bigrams = 3x "spam spam" → top=1.0, dup=1-1/3
    assert(stats(0) == (1L, Some(1.0), Some(0.6667), Some(1.0), Some(0.5)))
    // doc 2: all distinct
    assert(stats(1) == (2L, Some(0.3333), Some(0.0), Some(0.5), Some(0.0)))
    // doc 3: one bigram, zero trigrams → trigram columns null
    assert(stats(2) == (3L, Some(1.0), Some(0.0), None, None))
  }

  test("chunkStats counts corpus-wide duplicate chunks per doc") {
    val boiler = (1 to 8).map(i => s"w$i").mkString(" ") // one full chunk
    val docs = Seq(
      (1L, boiler + " unique tail of doc one here now yes"),
      (2L, boiler + " different ending for doc two entirely here"),
      (3L, "totally fresh words that appear nowhere else at all")
    ).toDF("doc_id", "text")
    val stats = Dedup.chunkStats(docs, "doc_id", "text", chunkWords = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    // docs 1+2 share their first 8-word chunk; everything else is unique
    assert(stats(0) == (1L, 2L, 1L, 0.5))
    assert(stats(1) == (2L, 2L, 1L, 0.5))
    assert(stats(2) == (3L, 2L, 0L, 0.0))
  }

  test("CMS registers total the occurrence stream and merge by summing") {
    val toks = Seq("a", "b", "a", "c", "a", "b").toDF("tok")
    val regs = CountMin.registers(toks, "tok", depth = 3, width = 16)
    val byRow = regs.groupBy("row").agg(sum("cnt").as("total"))
      .as[(Long, Long)].collect().toMap
    // every row of the sketch counts every occurrence exactly once
    assert(byRow == Map(0L -> 6L, 1L -> 6L, 2L -> 6L))
    // merging two shard sketches by summing cells == sketching the union
    val shardA = CountMin.registers(Seq("a", "b").toDF("tok"), "tok", 3, 16)
    val shardB = CountMin.registers(Seq("a", "c", "a", "b").toDF("tok"), "tok", 3, 16)
    val merged = shardA.unionByName(shardB)
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val direct = regs
    assert(merged.orderBy("row", "bucket").as[(Long, Long, Long)].collect()
      .toSeq == direct.orderBy("row", "bucket").as[(Long, Long, Long)]
      .collect().toSeq)
  }

  test("CMS estimate never undercounts and is exact without collisions") {
    val toks = (Seq.fill(5)("hot") ++ Seq("a", "b", "c")).toDF("tok")
    val regs = CountMin.registers(toks, "tok", depth = 4, width = 64)
    val items = Seq("hot", "a", "never_seen").toDF("tok")
    val est = CountMin.estimate(regs, items, "tok", depth = 4, width = 64)
      .as[(String, Long)].collect().toMap
    // the one-sided CMS guarantee: estimates never undercount (an unseen
    // token may still read a colliding cell — that's the structure's
    // false-positive mode, not a bug)
    assert(est("hot") >= 5L && est("a") >= 1L && est("never_seen") >= 0L)
  }

  test("Bloom filter never false-negatives and merges by bit union") {
    val ref = Seq("alpha", "beta", "gamma").toDF("tok")
    val bits = Bloom.bits(ref, "tok", m = 256, k = 3)
    val probes = Seq(
      (1L, "alpha"), (1L, "beta"),   // both members → both flagged
      (2L, "gamma"), (2L, "zeta"),   // one member, one maybe-FP
      (3L, "omega")                  // non-member
    ).toDF("id", "tok")
    val stats = Bloom.probeStats(bits, probes, "id", "tok", m = 256, k = 3)
      .orderBy("id").as[(Long, Long, Long)].collect()
    assert(stats(0) == ((1L, 2L, 2L)))
    assert(stats(1)._3 >= 1L)  // gamma must be flagged (no false negatives)
    assert(stats(2)._2 == 1L)
    // union of shard filters == filter of the union (sketch mergeability)
    val merged = Bloom.bits(Seq("alpha").toDF("tok"), "tok", m = 256, k = 3)
      .union(Bloom.bits(Seq("beta", "gamma").toDF("tok"), "tok",
        m = 256, k = 3))
      .distinct()
    assert(merged.orderBy("bit").as[Long].collect().toSeq ==
      bits.orderBy("bit").as[Long].collect().toSeq)
  }

  test("assignPacks gives offset-packing prefix sums, invariant to partitioning") {
    val docs = Seq.tabulate(60) { i =>
      (i.toLong, Seq.fill(i % 7 + 1)(s"w$i").mkString(" "))
    }.toDF("doc_id", "text")
    val packs = Packing.assignPacks(docs, "doc_id", "text",
      budget = 10, shards = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(packs.length == 60)
    // recompute the offset-packing invariants per shard
    packs.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._1)
      var cum = 0L
      ordered.foreach { case (_, _, n, cumTok, packId) =>
        assert(cumTok == cum + n)         // prefix sum in doc_id order
        assert(packId == cum / 10)        // pack where the first token lands
        cum = cumTok
      }
      // pack ids start at 0 and never skip
      val ids = ordered.map(_._5).distinct
      assert(ids.head == 0L && ids.zip(ids.tail).forall(p => p._2 - p._1 <= 1))
    }
    // physical partitioning must not change the assignment
    val reparted = Packing.assignPacks(docs.repartition(7), "doc_id", "text",
      budget = 10, shards = 3)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(reparted.toSeq == packs.toSeq)
  }

  test("packDigests digest the id-ordered pack text deterministically") {
    val docs = Seq.tabulate(40) { i =>
      (i.toLong, s"alpha beta w$i gamma")
    }.toDF("doc_id", "text")
    val a = Packing.packDigests(docs, "doc_id", "text", budget = 16, shards = 2)
      .orderBy("shard", "pack_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    val b = Packing.packDigests(docs.repartition(11), "doc_id", "text",
      budget = 16, shards = 2)
      .orderBy("shard", "pack_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(a == b)                       // shuffle-order independent
    assert(a.map(_._5).distinct.size == a.size) // distinct packs differ
    assert(a.map(_._3).sum == 40L)       // every doc in exactly one pack
  }
}
