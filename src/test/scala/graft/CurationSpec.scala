package graft

import graft.pipeline.CurationPipeline

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curation cascade drops low-quality, wrong-language, exact and near dups") {
    val base = "the quick brown fox jumps over the lazy dog near " +
      "the river bank today while the sun sets slowly behind the old hill"
    val docs = Seq(
      (1L, base),                      // keeper
      (2L, base),                      // exact dup of 1 -> exact stage
      (3L, base + " tonight"),         // near dup of 1 -> near stage
      (4L, "hi there"),                // too short -> quality stage
      (5L, "le chat est dans la maison et il mange pour vivre bien"), // fr
      (6L, "a completely different document about the engine and the data " +
        "pipeline that we keep because it is unique and long enough"))
      .toDF("doc_id", "text")
    val res = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set("en"), minJaccard = 0.8, stageCounts = true)
    assert(res.counts("input") == 6L)
    assert(res.counts("after_quality") == 5L, s"got ${res.counts}")
    assert(res.counts("after_language") == 4L, s"got ${res.counts}")
    assert(res.counts("after_exact_dedup") == 3L, s"got ${res.counts}")
    assert(res.counts("after_near_dedup") == 2L, s"got ${res.counts}")
    val kept = res.curated.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 6L))
  }

  test("optional decontamination stage drops benchmark-overlapping docs") {
    val base = "the quick brown fox jumps over the lazy dog near " +
      "the river bank today while the sun sets slowly behind the old hill"
    val unique = "a completely different document about the engine and " +
      "the data pipeline that we keep because it is unique and long enough"
    val docs = Seq((1L, base), (2L, unique)).toDF("doc_id", "text")
    // benchmark doc shares a long substring with doc 1 only
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val res = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set("en"), benchmarks = Some(bench),
      contaminationN = 3, maxContamination = 0.5, stageCounts = true)
    assert(res.counts("after_language") == 2L, s"got ${res.counts}")
    assert(res.counts("after_decontamination") == 1L, s"got ${res.counts}")
    assert(res.curated.select("doc_id").as[Long].collect().toSeq == Seq(2L))

    // without benchmarks the stage is a no-op and reports no count
    val off = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set("en"), stageCounts = true)
    assert(!off.counts.contains("after_decontamination"))
    assert(off.counts("after_near_dedup") == 2L)
  }

  test("optional repetition gate drops boilerplate-heavy docs") {
    val unique = "a completely different document about the engine and " +
      "the data pipeline that we keep because it is unique and long enough"
    // >60% of bigram occurrences are repeats — classic degenerate text
    val loopy = ("the spam machine goes brr " * 8).trim
    val docs = Seq((1L, unique), (2L, loopy)).toDF("doc_id", "text")
    val res = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set("en"), maxDupBigramFrac = Some(0.5),
      stageCounts = true)
    assert(res.counts("after_quality") == 2L, s"got ${res.counts}")
    assert(res.counts("after_repetition") == 1L, s"got ${res.counts}")
    assert(res.curated.select("doc_id").as[Long].collect().toSeq == Seq(1L))

    // gate off: loopy doc survives, and no repetition count is reported
    val off = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set("en"), stageCounts = true)
    assert(!off.counts.contains("after_repetition"))
    assert(off.counts("after_near_dedup") == 2L)
  }

  test("optional span-dedup stage cuts shared boilerplate and rewrites text") {
    val boiler = "subscribe to our newsletter for updates every day" // 8 words
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$boiler iota kappa lambda mu nu xi omicron pi"),
      (3L, s"$boiler rho sigma tau upsilon phi chi psi omega"),
      (4L, s"$boiler $boiler")) // nothing but boilerplate → dropped
      .toDF("doc_id", "text")
    val res = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set.empty, spanDedup = Some((8, 2L)), stageCounts = true)
    assert(res.counts("after_span_dedup") == 3L, s"got ${res.counts}")
    assert(res.counts("after_near_dedup") == 3L, s"got ${res.counts}")
    // the curated corpus carries the CLEANED text, boilerplate cut
    val kept = res.curated.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(kept.keySet == Set(1L, 2L, 3L))
    assert(kept(1L) == "alpha beta gamma delta epsilon zeta eta theta")
    assert(kept(2L) == "iota kappa lambda mu nu xi omicron pi")
    assert(kept(3L) == "rho sigma tau upsilon phi chi psi omega")

    // gate off: text untouched, no span count reported
    val off = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set.empty, stageCounts = true)
    assert(!off.counts.contains("after_span_dedup"))
    assert(off.curated.filter($"doc_id" === 1L).select("text")
      .as[String].head().startsWith(boiler))
  }

  test("spanMode Spans removes boundary-straddling duplicates chunk mode misses") {
    val dup = "join our mailing list" // 4 tokens, shared by all three docs
    val docs = Seq(
      (1L, s"alpha beta gamma $dup delta epsilon zeta"), // offset 3
      (2L, s"one two $dup three four five six"),         // offset 2
      (3L, s"red green blue white grey $dup black"))     // offset 5
      .toDF("doc_id", "text")
    // CHUNK mode: the duplicated run straddles each doc's fixed 4-token
    // windows at a DIFFERENT offset, so no chunk content reaches df > 2
    // and the boilerplate survives
    val chunk = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set.empty, spanDedup = Some((4, 2L)),
      spanMode = CurationPipeline.SpanChunks, stageCounts = true)
    assert(chunk.counts("after_span_dedup") == 3L, s"got ${chunk.counts}")
    val chunkKept = chunk.curated.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(chunkKept.keySet == Set(1L, 2L, 3L))
    assert(chunkKept.values.forall(_.contains(dup)), chunkKept)
    // SPAN mode (ExactSubstr): stride-1 shingles catch the run wherever
    // it starts — all three occurrences are cut, per-stage counts intact
    val span = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set.empty, spanDedup = Some((4, 2L)),
      spanMode = CurationPipeline.SpanSpans, stageCounts = true)
    assert(span.counts("after_span_dedup") == 3L, s"got ${span.counts}")
    assert(span.counts("after_near_dedup") == 3L, s"got ${span.counts}")
    val spanKept = span.curated.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(spanKept == Map(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "one two three four five six",
      3L -> "red green blue white grey black"), spanKept)
  }

  test("spanMode Lines cuts template blocks verbatim after html extraction") {
    // three pages from the same site template: nav + footer blocks
    // repeat across all docs (df=3 > maxDf=2), the article block is
    // unique per page. html extraction emits one line per source
    // block; line dedup then removes exactly the template lines and —
    // unlike the chunk/span modes — keeps the article text VERBATIM
    // (case and punctuation intact)
    def page(article: String): String =
      "<html><body><div>Home | About | Contact</div>" +
        s"<p>$article</p><div>(c) 2026 Example Corp. All rights " +
        "reserved.</div></body></html>"
    val a1 = "The Engine, Reloaded: a fast new pipeline for the data we " +
      "keep because it is unique and long enough for the gates!"
    val a2 = "A Completely Different Article about the sink and the " +
      "source that we keep because it is unique and long enough?"
    val a3 = "Yet Another Story: the table and the window and the rows " +
      "that we keep because it is unique and long enough."
    val docs = Seq((1L, page(a1)), (2L, page(a2)), (3L, page(a3)))
      .toDF("doc_id", "text")
    val res = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set.empty, html = true, spanDedup = Some((4, 2L)),
      spanMode = CurationPipeline.SpanLines, stageCounts = true)
    assert(res.counts("after_span_dedup") == 3L, s"got ${res.counts}")
    val kept = res.curated.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(kept == Map(1L -> a1, 2L -> a2, 3L -> a3), kept)
  }

  test("optional LM gate drops docs unlike the reference corpus") {
    val ref = Seq(
      (100L, "the engine reads the data and writes the result to the table"),
      (101L, "the pipeline moves the data through the engine to the sink"))
      .toDF("doc_id", "text")
    // doc 1 re-uses the reference vocabulary; doc 2 is all OOV tokens,
    // so every one of its tokens takes the smoothed 1/(N+V) floor
    val inVocab = "the engine reads the data and writes the result " +
      "to the table through the pipeline"
    val oov = "zanzibar quokka vexillology syzygy quixotic jabberwock " +
      "perambulate sesquipedalian obfuscate crepuscular floccinaucinihilipilification"
    val docs = Seq((1L, inVocab), (2L, oov)).toDF("doc_id", "text")
    // floor chosen between the two scores: in-vocab ≈ ln(c+1/N+V) over
    // frequent tokens (≫ -3.5), all-OOV = ln(1/(N+V)) ≈ -3.6
    val res = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set.empty, lmReference = Some(ref),
      minAvgLogProb = -3.5, stageCounts = true)
    assert(res.counts("after_lm") == 1L, s"got ${res.counts}")
    assert(res.curated.select("doc_id").as[Long].collect().toSeq == Seq(1L))

    // gate off: both survive, and no LM count is reported
    val off = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set.empty, stageCounts = true)
    assert(!off.counts.contains("after_lm"))
    assert(off.counts("after_near_dedup") == 2L)
  }

  test("clean stage canonicalizes text before the hashes and in the output") {
    val base = "a completely different document about the engine and the " +
      "data pipeline that we keep because it is unique and long enough"
    // doc 2 is doc 1 with re-rendered whitespace: different bytes,
    // identical AFTER canonicalization → with clean on the exact-dedup
    // stage collapses them (no near-dedup pass needed)
    val messy = "  a completely\tdifferent document about the engine " +
      "and the data pipeline that we keep because it is unique " +
      "and long enough\n"
    val docs = Seq((1L, base), (2L, messy)).toDF("doc_id", "text")
    val res = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set("en"), clean = true, stageCounts = true)
    assert(res.counts("after_exact_dedup") == 1L, s"got ${res.counts}")
    val out = res.curated.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L))
    assert(out(1L) == base) // curated output carries the canonical text
    // clean off: the same pair survives exact dedup (different bytes)
    val off = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set("en"), stageCounts = true)
    assert(off.counts("after_exact_dedup") == 2L, s"got ${off.counts}")
  }

  test("html stage extracts markup before any gate sees the text") {
    val body = "a completely different document about the engine and " +
      "the data pipeline that we keep because it is unique and long enough"
    // raw markup: without extraction the tag soup dilutes alpha_ratio
    // and the word list; two docs whose MARKUP differs but whose text
    // is identical must collapse in exact dedup once html is on
    val h1 = s"<html><body><p>$body</p><script>var x = 1;</script></body></html>"
    val h2 = s"<html><body><div><p>$body</p></div>" +
      "<script>var completely_different_script = 42;</script></body></html>"
    val docs = Seq((1L, h1), (2L, h2)).toDF("doc_id", "text")
    val res = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set("en"), html = true, stageCounts = true)
    assert(res.counts("after_exact_dedup") == 1L, s"got ${res.counts}")
    val out = res.curated.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> body), s"got $out")
    // html off: different markup bytes → both survive exact dedup
    val off = CurationPipeline.run(docs, "doc_id", "text",
      languages = Set("en"), stageCounts = true)
    assert(off.counts("after_exact_dedup") == 2L, s"got ${off.counts}")
  }

  test("observe counts once when the observed subtree is self-joined") {
    // Pins the probed Spark behavior the stage counts depend on: a
    // named CollectMetrics accumulator collects ONCE per materialized
    // pass even when the observed subtree is DUPLICATED by a
    // self-join (the cascade's slim frames feed both a gate and the
    // join back). If this fails after a Spark upgrade, the
    // CurationPipeline.run(stageCounts = true) counts are no longer
    // trustworthy — revert to cache-and-count per stage.
    import org.apache.spark.sql.functions.{col, count, lit}
    val o = org.apache.spark.sql.Observation()
    val base = spark.range(100)
      .select(col("id"), (col("id") % 10).as("k"))
      .observe(o, count(lit(1)).as("n"))
    // both consumers prune to different columns, forcing the planner
    // to keep two scans of the observed subtree under one action
    val joined = base.join(base.select(col("id")), Seq("id"))
    assert(joined.count() === 100L)
    assert(o.get("n").asInstanceOf[Long] === 100L,
      "CollectMetrics double-counted under a duplicated subtree — " +
        "stage counts in CurationPipeline.run(stageCounts = true) " +
        "depend on single-collection semantics")
  }
}
