package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, Scrub}

/** Blocklist screening, regex redaction, temperature mixing, and the
  * near-dup keeper corpus.
  */
class ScrubSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("blocklistStats counts occurrences and distinct terms, flags keep") {
    val docs = Seq(
      (1L, "the slow slow dup query"),   // 3 blocked occurrences, 2 terms
      (2L, "Clean text entirely"),       // none
      (3L, "DUP dup! dup, slow")         // normalization folds case/punct
    ).toDF("doc_id", "text")
    val out = Scrub.blocklistStats(docs, "doc_id", "text",
      terms = Seq("slow", "dup"), maxBlocked = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out(0) == ((1L, 3L, 2L, false)))
    assert(out(1) == ((2L, 0L, 0L, true)))
    assert(out(2) == ((3L, 4L, 2L, false)))
  }

  test("redact applies PII rules in order and counts per-rule matches") {
    val df = Seq(
      (1L, "mail a.user+x@site.org or call +1 (555) 123-4567 room 9"),
      (2L, "no pii at all")
    ).toDF("id", "s")
    val out = Scrub.redact(df, "s", Scrub.PiiRules).orderBy("id")
      .as[(Long, String, String, Long, Long, Long)].collect()
    // email first, then the phone, then the bare digit run; each later
    // rule sees earlier rules' output so placeholder text is never re-hit
    assert(out(0)._3 == "mail <EMAIL> or call <PHONE> room <NUM>")
    assert((out(0)._4, out(0)._5, out(0)._6) == ((1L, 1L, 1L)))
    assert(out(1)._3 == "no pii at all")
    assert((out(1)._4, out(1)._5, out(1)._6) == ((0L, 0L, 0L)))
  }

  test("temperatureMix keeps the largest source at keepLargest and boosts small ones") {
    // sources sized 400/100/25: sqrt rebalance at keepLargest=0.5 gives
    // cutoffs 0.5, 1.0, 1.0 → small sources keep everything
    val docs = (0 until 400).map(i => (i.toLong, "big")) ++
      (400 until 500).map(i => (i.toLong, "mid")) ++
      (500 until 525).map(i => (i.toLong, "tiny"))
    val df = docs.toDF("doc_id", "source")
    val kept = Sampling.temperatureMix(df, "doc_id", "source",
      keepLargest = 0.5)
    val bySource = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource("mid") == 100L && bySource("tiny") == 25L)
    // the hash decision is uniform-ish; 0.5 cutoff on 400 keys lands
    // well inside (100, 300) with overwhelming margin
    assert(bySource("big") > 100L && bySource("big") < 300L)
    // determinism: same inputs → identical kept set
    val again = Sampling.temperatureMix(df, "doc_id", "source",
      keepLargest = 0.5)
    assert(kept.select("doc_id").except(again.select("doc_id")).isEmpty &&
      again.select("doc_id").except(kept.select("doc_id")).isEmpty)
  }

  test("nearDupKeepers keeps singletons and cluster minima only") {
    val docs = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (7L, "z"), (9L, "e")
    ).toDF("doc_id", "text")
    // clusters {1,2,3} and {4,9}; 7 is in no cluster and survives
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 9L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(edges, "id_a", "id_b")
    val kept = Dedup.nearDupKeepers(docs, "doc_id", comps)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 7L))
  }
}
