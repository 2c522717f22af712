package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Structured Streaming behavior: watermark-windowed aggregation and the
  * stateful (flatMapGroupsWithState) sessionizer, driven by MemoryStream
  * micro-batches.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventsFrom(input: MemoryStream[(Long, Long, Long)]) =
    input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_seconds(col("_2")).as("ts"),
        col("_3").as("event_id"),
        lit("click").as("event_type"),
        lit(1.0).as("value"))

  test("windowed counts with watermark emit closed windows, drop late rows") {
    val input = MemoryStream[(Long, Long, Long)](spark)
    val q = EventStreams
      .streamingWindowedCounts(eventsFrom(input),
        windowLength = "1 hour", lateness = "30 minutes")
      .writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    try {
      val h = 3600L
      input.addData((1L, 10 * h, 1L), (1L, 10 * h + 600, 2L))
      q.processAllAvailable()
      // watermark = max_ts - 30min is still inside hour 10 → nothing final
      assert(spark.table("winagg").count() == 0)

      // jump to hour 12: watermark passes end of hour-10 window
      input.addData((1L, 12 * h, 3L))
      q.processAllAvailable()
      val closed = spark.table("winagg")
        .select("window_start", "n_events").as[(Long, Long)].collect().toSet
      assert(closed == Set((10 * h, 2L)))

      // a straggler inside hour 10 is now behind the watermark → dropped
      input.addData((1L, 10 * h + 1200, 4L))
      input.addData((1L, 14 * h, 5L))
      q.processAllAvailable()
      val after = spark.table("winagg")
        .select("window_start", "n_events").as[(Long, Long)].collect().toSet
      assert(after == Set((10 * h, 2L), (12 * h, 1L)),
        "late row must not resurrect or change the closed hour-10 window")
    } finally q.stop()
  }

  test("stateful sessionizer: watermark flushes final sessions in order") {
    val input = MemoryStream[(Long, Long, Long)](spark)
    val q = EventStreams
      .sessionizeStream(eventsFrom(input),
        gapSeconds = 1800L, lateness = "10 minutes")
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      val t0 = 100000L
      def sessions7 = spark.table("sess").as[EventStreams.Session]
        .collect().toSeq.filter(_.user_id == 7L).sortBy(_.session_id)

      // user 7: two events 10 min apart (session 1), one past the gap
      // (session 2) — both stay OPEN until the watermark passes end+gap
      input.addData((7L, t0, 1L), (7L, t0 + 600, 2L))
      input.addData((7L, t0 + 2401, 3L))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0, "open sessions must not emit")

      // advance event time far ahead via another user; the extra batch
      // lets the event-time timeout fire after the watermark update
      input.addData((9L, t0 + 20000, 4L))
      q.processAllAvailable()
      input.addData((9L, t0 + 40000, 5L))
      q.processAllAvailable()
      assert(sessions7 == Seq(
        EventStreams.Session(7L, 1L, 2L, t0, t0 + 600),
        EventStreams.Session(7L, 2L, 1L, t0 + 2401, t0 + 2401)),
        s"both sessions flush once final, numbered in start order; got $sessions7")

      // numbering survives the flush: the next session is 3, not 1
      input.addData((7L, t0 + 50000, 6L))
      q.processAllAvailable()
      input.addData((9L, t0 + 99000, 7L))
      q.processAllAvailable()
      input.addData((9L, t0 + 99500, 8L))
      q.processAllAvailable()
      assert(sessions7.map(_.session_id) == Seq(1L, 2L, 3L),
        s"session ids must continue after a timeout flush; got $sessions7")
    } finally q.stop()
  }

  test("sessionizer merges out-of-order and bridging events across batches") {
    val input = MemoryStream[(Long, Long, Long)](spark)
    val q = EventStreams
      .sessionizeStream(eventsFrom(input),
        gapSeconds = 1800L, lateness = "2 hours")
      .writeStream.format("memory").queryName("sess2")
      .outputMode("append").start()
    try {
      // batch 1: two intervals > gap apart; batch 2: a BRIDGE event that
      // lands between them (out of order, still inside the watermark)
      input.addData((13L, 1000L, 1L), (13L, 4500L, 2L))
      q.processAllAvailable()
      input.addData((13L, 2800L, 3L))
      q.processAllAvailable()
      // advance the watermark far past everything; extra batch for timeout
      input.addData((14L, 50000L, 4L))
      q.processAllAvailable()
      input.addData((14L, 90000L, 5L))
      q.processAllAvailable()
      val got = spark.table("sess2").as[EventStreams.Session]
        .collect().toSeq.filter(_.user_id == 13L)
      assert(got == Seq(EventStreams.Session(13L, 1L, 3L, 1000L, 4500L)),
        s"the bridge event must merge both intervals into ONE session; got $got")
    } finally q.stop()
  }

  test("streaming exact dedup: first arrival wins, replays drop") {
    val input = MemoryStream[(Long, Long, String)](spark)
    val docs = input.toDF()
      .select(col("_1").as("doc_id"),
        timestamp_seconds(col("_2")).as("ts"), col("_3").as("text"))
    val q = graft.operators.Dedup
      .streamingExactDedup(docs, "text", "ts", lateness = "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData((1L, 1000L, "same content"), (2L, 1001L, "same content"),
        (3L, 1002L, "unique content"))
      q.processAllAvailable()
      val kept = spark.table("dedup").select("doc_id")
        .as[Long].collect().toSet
      assert(kept.contains(3L) && kept.size == 2,
        s"one of the duplicate pair plus the unique doc must pass; got $kept")
      // a later replay of the same content within the watermark also drops
      input.addData((4L, 1100L, "same content"))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }

  test("stateless screening (blocklist + redaction) runs per-batch on a stream") {
    // blocklistStats and redact are pure projections, so they compose
    // into a streaming query with no state, no watermark, no output-mode
    // restrictions — the at-ingest screening shape for a live corpus
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"))
    val flags = graft.operators.Scrub.blocklistStats(docs, "doc_id",
      "text", terms = Seq("spam"), maxBlocked = 0)
      .writeStream.format("memory").queryName("screen_flags")
      .outputMode("append").start()
    val red = graft.operators.Scrub.redact(docs, "text",
      Seq(("[0-9]+", "<NUM>")))
      .writeStream.format("memory").queryName("screen_red")
      .outputMode("append").start()
    try {
      input.addData((1L, "clean text 42"), (2L, "spam spam here"))
      flags.processAllAvailable()
      red.processAllAvailable()
      val f = spark.table("screen_flags").select("doc_id", "keep")
        .as[(Long, Boolean)].collect().sortBy(_._1)
      assert(f.toSeq == Seq((1L, true), (2L, false)))
      val r = spark.table("screen_red")
        .select("doc_id", "text_redacted", "n_0")
        .as[(Long, String, Long)].collect().sortBy(_._1)
      assert(r(0) == ((1L, "clean text <NUM>", 1L)))
      assert(r(1) == ((2L, "spam spam here", 0L)))
    } finally { flags.stop(); red.stop() }
  }

  test("literal-model centroid classification labels a stream at ingest") {
    // the model trains on a static frame; centroidTopLabelLit compiles
    // it into a pure projection (no join/window), so the SAME call
    // works on a streaming DataFrame — label propagation at ingest
    val corpus = Seq(
      (0L, Array(1f, 0.05f), 0), (1L, Array(0.9f, 0f), 0),
      (10L, Array(0f, 1f), 1), (11L, Array(0.05f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = graft.operators.Classify.labelCentroids(
      corpus, "vec_id", "embedding", "label")
    val input = MemoryStream[(Long, Array[Float])](spark)
    val stream = input.toDF()
      .select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = graft.operators.Classify.centroidTopLabelLit(
      stream, "vec_id", "embedding", cents, "label")
      .writeStream.format("memory").queryName("stream_labels")
      .outputMode("append").start()
    try {
      input.addData((100L, Array(0.8f, 0.1f)), (101L, Array(-0.02f, 0.8f)))
      q.processAllAvailable()
      val out = spark.table("stream_labels")
        .select("query_id", "pred_label")
        .as[(Long, Long)].collect().sortBy(_._1)
      assert(out.toSeq == Seq((100L, 0L), (101L, 1L)))
    } finally q.stop()
  }

  test("streaming PQ ingest: arrivals encode against the static model " +
    "and union into the batch code table") {
    // index-side incremental maintenance: a static corpus builds the
    // coarse centroids + residual codebooks offline; NEW embeddings
    // arrive on a stream and are assigned + residual-PQ-encoded at
    // ingest by the literal-model projection. Parity: the streamed
    // codes equal batch pqEncodeResidual on the same rows, and the
    // union with the old corpus's codes equals a full-batch re-encode
    // of everything — the searchable table is maintained, not rebuilt.
    def vec(id: Long): Array[Float] =
      Array.tabulate(16)(i => (((id * 31 + i * 7) % 13) - 6).toFloat / 3f)
    val corpus = (0L until 40L).map(id => (id, vec(id)))
      .toDF("vec_id", "embedding")
    val cents = corpus.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cb = graft.operators.Pq.pqSeedCodebooks(
      graft.operators.Pq.residuals(corpus, "vec_id", "embedding", cents)
        .filter(col("vec_id") >= 8),
      "vec_id", "rvec", m = 4, ksub = 8)
    val fresh = (100L until 106L).map(id => (id, vec(id)))
    val input = MemoryStream[(Long, Array[Float])](spark)
    val stream = input.toDF()
      .select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = graft.operators.Pq.pqEncodeResidualLit(
      stream, "vec_id", "embedding", cents, cb)
      .select(col("vec_id"), col("cell"),
        array_join(transform(col("codes"), c => c.cast("string")), ",")
          .as("codes"))
      .writeStream.format("memory").queryName("stream_pq")
      .outputMode("append").start()
    try {
      input.addData(fresh.take(3): _*)
      q.processAllAvailable()
      input.addData(fresh.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_pq")
        .as[(Long, Long, String)].collect().toSet
      def batchCodes(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Pq.pqEncodeResidual(df, "vec_id", "embedding",
          cents, cb)
          .select(col("vec_id"), col("cell"),
            array_join(transform(col("codes"), c => c.cast("string")),
              ",").as("codes"))
          .as[(Long, Long, String)].collect().toSet
      val freshBatch = batchCodes(fresh.toDF("vec_id", "embedding"))
      assert(streamed == freshBatch,
        s"stream/batch encode divergence:\n$streamed\nvs\n$freshBatch")
      // maintained table == full rebuild
      val maintained = batchCodes(corpus) ++ streamed
      val rebuilt = batchCodes(
        corpus.unionAll(fresh.toDF("vec_id", "embedding")))
      assert(maintained == rebuilt,
        s"union∪stream must equal the full re-encode")
    } finally q.stop()
  }

  test("substring screening and redaction run statelessly on a stream") {
    // both are pure projections (automaton = literal reference object),
    // so the SAME calls gate and rewrite a live feed at ingest
    val input = MemoryStream[(Long, String)](spark)
    val stream = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"))
    val gated = graft.operators.Scrub.substringBlocklistStats(
      stream, "doc_id", "text", Seq("bad word"), maxHits = 0)
      .filter(col("keep")).select("doc_id")
    val q = gated
      .writeStream.format("memory").queryName("screenstream")
      .outputMode("append").start()
    val q2 = graft.operators.Scrub.redactSubstrings(
      stream, "doc_id", "text", Seq("bad word"))
      .select("doc_id", "clean_text")
      .writeStream.format("memory").queryName("redactstream")
      .outputMode("append").start()
    try {
      input.addData((1L, "totally fine text"),
        (2L, "contains a bad word here"))
      q.processAllAvailable()
      q2.processAllAvailable()
      assert(spark.table("screenstream").as[Long].collect().toSet
        == Set(1L))
      val red = spark.table("redactstream")
        .as[(Long, String)].collect().toMap
      assert(red(2L) == "contains a ******** here", s"got $red")
    } finally { q.stop(); q2.stop() }
  }

  test("real feature extraction embeds a binary-asset stream at ingest") {
    // embedPartitions is a pure mapPartitions stage (no shuffle, no
    // state), so the SAME call runs on a streaming DataFrame — the
    // decode → feature shape of a live multimodal ingest feed
    val input = MemoryStream[(Long, String, Array[Byte])](spark)
    val stream = input.toDF()
      .select(col("_1").as("id"), col("_2").as("modality"),
        col("_3").as("content"))
    val q = graft.multimodal.Multimodal.embedPartitions(stream, dim = 16)
      .writeStream.format("memory").queryName("stream_embeds")
      .outputMode("append").start()
    try {
      val bmp = graft.multimodal.Multimodal.syntheticBmp(5L, 4, 3)
      val garbage = "not an image".getBytes("UTF-8")
      input.addData((5L, "image", bmp), (6L, "image", garbage))
      q.processAllAvailable()
      val out = spark.table("stream_embeds")
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      assert(out(5L) == graft.multimodal.Multimodal
        .histEmbedBytes(bmp, "image", 16).toSeq)
      assert(out(6L) == graft.multimodal.Multimodal
        .stubEmbedBytes(garbage, 16).toSeq)
    } finally q.stop()
  }

  test("streaming parquet sink: append-mode windows land durably, once") {
    val base = s"/tmp/graft-stream-sink-${ProcessHandle.current().pid()}"
    val input = MemoryStream[(Long, Long, Long)](spark)
    val q = EventStreams
      .streamingWindowedCounts(eventsFrom(input),
        windowLength = "1 hour", lateness = "30 minutes")
      .writeStream.format("parquet")
      .option("path", s"$base/data")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    try {
      val h = 3600L
      input.addData((1L, 10 * h, 1L), (1L, 10 * h + 600, 2L))
      q.processAllAvailable()
      input.addData((1L, 12 * h, 3L)) // watermark closes hour-10 window
      q.processAllAvailable()
      input.addData((1L, 14 * h, 4L)) // closes hour-12; hour-14 stays open
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$base/data")
        .select("window_start", "n_events").as[(Long, Long)].collect().toSeq
      // exactly-once: each closed window appears exactly one time in the
      // committed files (the sink's transaction log de-dups batches)
      assert(rows.sorted == Seq((10 * h, 2L), (12 * h, 1L)),
        s"got $rows")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
  }

  test("stream-stream interval join matches the batch range join") {
    val rows = Seq(
      // user 1: click at 1000 with errors at 950 (in window), 939 (out),
      // 1000 (boundary, in); click at 2000 with no errors near
      (1L, 950L, 10L, "error"), (1L, 939L, 11L, "error"),
      (1L, 1000L, 12L, "click"), (1L, 1000L, 13L, "error"),
      (1L, 2000L, 14L, "click"), (1L, 1200L, 15L, "error"),
      // user 2: error AFTER the click must not match
      (2L, 1000L, 20L, "click"), (2L, 1010L, 21L, "error"))
    val expected = Set(
      (1L, 12L, 1000L, 10L, 950L),
      (1L, 12L, 1000L, 13L, 1000L))

    // batch formulation
    val ev = rows.toDF("user_id", "secs", "event_id", "event_type")
    val batch = graft.operators.TemporalJoins.rangeJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "error"),
      "user_id", "event_id", "secs", maxBefore = 60L, maxAfter = 0L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(batch == expected)

    // streaming formulation over the same rows, two micro-batches
    val input = MemoryStream[(Long, Long, Long, String)](spark)
    def side(tpe: String) = input.toDF()
      .filter(col("_4") === tpe)
      .select(col("_1").as("user_id"), col("_3").as("event_id"),
        timestamp_seconds(col("_2")).as("ts"))
    val q = EventStreams
      .streamingIntervalJoin(side("click"), side("error"),
        beforeSeconds = 60L, lateness = "10 minutes")
      .writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      val (first, second) = rows.splitAt(4)
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(second: _*)
      q.processAllAvailable()
      val streamed = spark.table("ivj")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == expected)
    } finally q.stop()
  }

  test("mergeable sketch aggregators run incrementally over a stream") {
    // MinHash and bounded TopK buffers merge associatively/commutatively,
    // which is exactly what makes them streaming-safe: the running state
    // IS the partial-aggregation buffer. Feed postings in two batches and
    // check the streamed sketch equals the batch sketch over all data.
    val minhash = udaf(new graft.functions.MinHashAggregator(4))
    val topk = udaf(new graft.functions.TopKAggregator(2))
    val input = MemoryStream[(Long, Long)](spark) // (doc_id, token_hash)
    val q = input.toDF().select(col("_1").as("doc_id"), col("_2").as("h"))
      .groupBy("doc_id")
      .agg(minhash(col("h")).as("sig"),
        topk(col("h").cast("double"), col("h")).as("top"))
      .writeStream.format("memory").queryName("sketches")
      .outputMode("complete").start()
    try {
      val batch1 = Seq((1L, 101L), (1L, 202L), (2L, 303L))
      val batch2 = Seq((1L, 404L), (2L, 505L), (2L, 606L))
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("sketches")
        .select("doc_id", "sig", "top")
        .as[(Long, Seq[Long], Seq[(Double, Long)])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val batch = (batch1 ++ batch2).toDF("doc_id", "h")
        .groupBy("doc_id")
        .agg(minhash(col("h")).as("sig"),
          topk(col("h").cast("double"), col("h")).as("top"))
        .select("doc_id", "sig", "top")
        .as[(Long, Seq[Long], Seq[(Double, Long)])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(streamed == batch)
      // and the top-k really is capped + ordered
      assert(streamed(2L)._2 == Seq((606.0, 606L), (505.0, 505L)))
    } finally q.stop()
  }

  test("streaming curation gates quality/language and dedups at ingest") {
    val good = "the quick brown fox jumps over the lazy dog near " +
      "the river bank today while the sun sets slowly behind the old hill"
    val other = "a completely different document about the engine and " +
      "the data pipeline that we keep because it is unique and long enough"
    val input = MemoryStream[(Long, String, Long)](spark)
    val stream = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_seconds(col("_3")).as("ts"))
    val q = graft.pipeline.CurationPipeline
      .runStreaming(stream, "doc_id", "text", "ts", languages = Set("en"))
      .select("doc_id")
      .writeStream.format("memory").queryName("curstream")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, good, 100L),   // passes all gates
        (2L, "hi there", 110L), // quality-dropped (too short)
        (3L, "le chat est dans la maison et il mange pour vivre bien", 120L),
        (4L, good, 130L))   // exact dup of 1 within watermark -> dropped
      q.processAllAvailable()
      input.addData(
        (5L, good, 140L),   // replay across batches -> still dropped
        (6L, other, 150L))  // new unique doc -> passes
      q.processAllAvailable()
      val kept = spark.table("curstream").as[Long].collect().toSet
      assert(kept == Set(1L, 6L), s"got $kept")
    } finally q.stop()
  }

  test("streaming near-dedup drops token-set collisions the exact key misses") {
    // doc 12 is doc 11 reordered with a repeat — different bytes, same
    // normalized token SET, so the SimHash state key collides where the
    // content hash would not; doc 13 is genuinely different and passes
    val a = "the quick brown fox jumps over the lazy dog near the river " +
      "bank today while the sun sets slowly behind the old hill"
    val aReordered = "near the river bank today the quick brown fox fox " +
      "jumps over the lazy dog while the sun sets slowly behind the old hill"
    val b = "a completely different document about the engine and the " +
      "data pipeline that we keep because it is unique and long enough"
    val input = MemoryStream[(Long, String, Long)](spark)
    val stream = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_seconds(col("_3")).as("ts"))
    val q = graft.pipeline.CurationPipeline
      .runStreaming(stream, "doc_id", "text", "ts", languages = Set("en"),
        nearDedupBits = Some(32))
      .select("doc_id")
      .writeStream.format("memory").queryName("neardedupstream")
      .outputMode("append").start()
    try {
      input.addData((11L, a, 100L), (12L, aReordered, 110L), (13L, b, 120L))
      q.processAllAvailable()
      input.addData((14L, a, 130L)) // exact replay still drops (subsumed)
      q.processAllAvailable()
      val kept = spark.table("neardedupstream").as[Long].collect().toSet
      assert(kept == Set(11L, 13L), s"got $kept")
    } finally q.stop()
  }

  test("streaming LSH gate drops arrivals colliding with the landed corpus") {
    // ingest near-dedup vs the ALREADY-LANDED corpus: a static banded
    // index gates the stream through stateless broadcast probes, and
    // the batch shapes (streamingLshGate on a batch frame, lshGate)
    // keep the identical set — stream/batch parity
    val landed = "the quick brown fox jumps over the lazy dog near the " +
      "river bank today while the sun sets slowly behind the old hill"
    val fresh = "a completely different document about the engine and " +
      "the data pipeline that we keep because it is unique and long enough"
    val other = "another entirely separate piece of text about gardens " +
      "and the many green plants that grow slowly near the stone wall"
    val shingle3 = graft.operators.Dedup.shingleTokenizer(3)
    val corpus = Seq((100L, landed)).toDF("doc_id", "text")
    val idx = graft.operators.Dedup.indexBandKeys(corpus, "doc_id", "text",
      k = 8, bands = 4, tokenize = shingle3)
    val input = MemoryStream[(Long, String, Long)](spark)
    val stream = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_seconds(col("_3")).as("ts"))
    val q = graft.pipeline.CurationPipeline
      .runStreaming(stream, "doc_id", "text", "ts", languages = Set("en"),
        lshIndex = Some(idx))
      .select("doc_id")
      .writeStream.format("memory").queryName("lshgatestream")
      .outputMode("append").start()
    try {
      input.addData((21L, landed, 100L), // every band collides -> dropped
        (22L, fresh, 110L))              // no shared shingles -> kept
      q.processAllAvailable()
      input.addData((23L, other, 120L))  // later batch, unique -> kept
      q.processAllAvailable()
      val kept = spark.table("lshgatestream").as[Long].collect().toSet
      assert(kept == Set(22L, 23L), s"got $kept")
      // batch parity: both batch shapes of the gate keep the same set
      val batch = Seq((21L, landed), (22L, fresh), (23L, other))
        .toDF("doc_id", "text")
      val viaStreamShape = graft.operators.Dedup.streamingLshGate(batch,
        "text", idx, k = 8, bands = 4, tokenize = shingle3)
        .select("doc_id").as[Long].collect().toSet
      val viaBatchShape = graft.operators.Dedup.lshGate(batch, "doc_id",
        "text", idx, k = 8, bands = 4, tokenize = shingle3)
        .select("doc_id").as[Long].collect().toSet
      assert(viaStreamShape == kept && viaBatchShape == kept,
        s"stream/batch divergence: stream=$kept " +
          s"streamShape=$viaStreamShape batchShape=$viaBatchShape")
    } finally q.stop()
  }

  test("streaming frontier: URLs canonicalize and robots-gate at ingest") {
    // the crawl-frontier shape: a stream of discovered URLs meets a
    // STATIC broadcast rules table — canonicalization and the
    // higher-order longest-match are pure projections/broadcast joins,
    // so the whole gate is streaming-legal with no state store
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /private\n" +
      "Allow: /private/ok\n")).toDF("host", "txt")
    val rules = graft.operators.Robots
      .rules(robots, "host", "txt", "bot").toDF()
    val input = MemoryStream[(Long, String)](spark)
    val urls = input.toDF()
      .select(col("_1").as("id"),
        graft.operators.Urls.normalize(col("_2")).as("url"))
      .select(col("id"), col("url"),
        graft.operators.Urls.host(col("url")).as("host"),
        regexp_extract(col("url"), "://[^/]*(/.*)$", 1).as("path"))
    val q = graft.operators.Robots.gate(urls, rules, "host", "path")
      .select("id", "url", "allowed")
      .writeStream.format("memory").queryName("frontier")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "HTTP://WWW.A.com/private/x?utm_source=z"),
        (2L, "http://a.com/private/ok/y"),
        (3L, "https://b.com/free"))
      q.processAllAvailable()
      val out = spark.table("frontier")
        .as[(Long, String, Boolean)].collect().sortBy(_._1).toSeq
      assert(out == Seq(
        (1L, "http://a.com/private/x", false),
        (2L, "http://a.com/private/ok/y", true),
        (3L, "https://b.com/free", true)), s"got $out")
    } finally q.stop()
  }

  test("streaming html stage extracts markup before the dedup state key") {
    // docs 1 and 2 differ only in MARKUP: with html on, both extract to
    // the same text, so the exact-dedup state key collides and doc 2
    // drops at ingest; doc 3 is real markup around different text and
    // passes, carrying the EXTRACTED text downstream
    val body = "a completely different document about the engine and the " +
      "data pipeline that we keep because it is unique and long enough"
    val other = "the quick brown fox jumps over the lazy dog near the " +
      "river bank today while the sun sets slowly behind the old hill"
    val input = MemoryStream[(Long, String, Long)](spark)
    val stream = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_seconds(col("_3")).as("ts"))
    val q = graft.pipeline.CurationPipeline
      .runStreaming(stream, "doc_id", "text", "ts", languages = Set("en"),
        html = true)
      .select(col("doc_id"), col("text"))
      .writeStream.format("memory").queryName("htmlstream")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, s"<html><body><p>$body</p><script>var x = 1;</script>" +
          "</body></html>", 100L),
        (2L, s"<html><body><div><p>$body</p></div></body></html>", 110L),
        (3L, s"<p>$other</p><!-- nav boilerplate -->", 120L))
      q.processAllAvailable()
      val out = spark.table("htmlstream").as[(Long, String)].collect().toMap
      assert(out.keySet == Set(1L, 3L), s"got ${out.keySet}")
      assert(out(1L) == body && out(3L) == other,
        "surviving rows must carry the extracted text")
    } finally q.stop()
  }

  test("streaming clean stage canonicalizes before the dedup state key") {
    // doc 2 is doc 1 with re-rendered whitespace: different bytes,
    // identical after canonicalization — with clean on, the EXACT dedup
    // state key (hash of canonical text) collides and doc 2 drops at
    // ingest; doc 3 is genuinely different and passes
    val base = "a completely different document about the engine and the " +
      "data pipeline that we keep because it is unique and long enough"
    val messy = "  a completely\tdifferent document about the engine " +
      "and the data pipeline that we keep because it is unique " +
      "and long enough\n"
    val other = "the quick brown fox jumps over the lazy dog near the " +
      "river bank today while the sun sets slowly behind the old hill"
    val input = MemoryStream[(Long, String, Long)](spark)
    val stream = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_seconds(col("_3")).as("ts"))
    val q = graft.pipeline.CurationPipeline
      .runStreaming(stream, "doc_id", "text", "ts", languages = Set("en"),
        clean = true)
      .select(col("doc_id"), col("text"))
      .writeStream.format("memory").queryName("cleanstream")
      .outputMode("append").start()
    try {
      input.addData((1L, base, 100L), (2L, messy, 110L), (3L, other, 120L))
      q.processAllAvailable()
      val out = spark.table("cleanstream")
        .as[(Long, String)].collect().toMap
      assert(out.keySet == Set(1L, 3L), s"got ${out.keySet}")
      assert(out(1L) == base) // surviving rows carry the canonical text
    } finally q.stop()
  }

  test("batch and streaming curation keep the same rows under late duplicates") {
    // the runStreaming scaladoc claims a row passes the stream gate iff
    // it would pass the batch gate: same quality/language expressions,
    // and watermarked dedup ≡ batch exact dedup when the first arrival
    // is the min id and replays land within the lateness window. Late
    // duplicates (event time BEHIND the stream's max, inside the
    // watermark) are exactly the case that distinguishes
    // dropDuplicatesWithinWatermark from naive per-batch dedup.
    val good = "the quick brown fox jumps over the lazy dog near " +
      "the river bank today while the sun sets slowly behind the old hill"
    val other = "a completely different document about the engine and " +
      "the data pipeline that we keep because it is unique and long enough"
    val rows = Seq(
      (1L, good, 100L),   // passes all gates
      (2L, "hi there", 110L),  // quality-dropped
      (3L, "le chat est dans la maison et il mange pour vivre bien", 120L),
      (4L, good, 105L),   // exact dup, late event time
      (5L, other, 150L),  // passes
      (6L, other, 130L))  // exact dup, late event time
    // batch: the full cascade over the same corpus (near-dedup is a
    // no-op here — the only duplicates are exact)
    val batchKept = graft.pipeline.CurationPipeline
      .run(rows.toDF("doc_id", "text", "secs"), "doc_id", "text",
        languages = Set("en"))
      .curated.select("doc_id").as[Long].collect().toSet
    // streaming: on-time rows first, then the late duplicates in a
    // second batch — both inside the 1 h lateness window
    val input = MemoryStream[(Long, String, Long)](spark)
    val stream = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_seconds(col("_3")).as("ts"))
    val q = graft.pipeline.CurationPipeline
      .runStreaming(stream, "doc_id", "text", "ts", languages = Set("en"))
      .select("doc_id")
      .writeStream.format("memory").queryName("curparity")
      .outputMode("append").start()
    try {
      input.addData(rows.filter(r => r._1 != 4L && r._1 != 6L))
      q.processAllAvailable()
      input.addData(rows.filter(r => r._1 == 4L || r._1 == 6L))
      q.processAllAvailable()
      val streamKept = spark.table("curparity").as[Long].collect().toSet
      assert(batchKept == Set(1L, 5L), s"batch kept $batchKept")
      assert(streamKept == batchKept,
        s"stream kept $streamKept, batch kept $batchKept")
    } finally q.stop()
  }

  test("batch and streaming agree with the C4 and Gopher gates on") {
    // the published-filter stages are row-local, so stream and batch
    // must keep identical rows AND produce identical rewritten text
    val goodLines = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away today.",
      "a merry band of travelers walked along the river and sang old songs.",
      "every morning the baker makes fresh bread and the town wakes slowly.",
      "children play in the park while the birds sing from the tall trees.")
    val good = goodLines.mkString("\n")
    val otherLines = Seq(
      "deep in the valley a small stream carries cold water past the mill.",
      "sailors watch the harbor lights and wait for the tide to turn again.",
      "the library keeps ancient maps and letters from a hundred years ago.",
      "farmers gather ripe apples before the first frost covers the field.",
      "at night the watchman walks the wall and counts the quiet stars above.")
    val withJs = (otherLines :+
      "click here to enable javascript in your browser now").mkString("\n")
    val withBrace = good + "\nfunction foo() { return 1; }"
    val short = "this is a short document.\n" +
      "it has three good sentences here.\n" +
      "but it stays well under fifty words in total today."
    // doc 6 opens by repeating one phrase six times: the repeat-span
    // stage must collapse the repetition (first occurrence survives)
    // and the doc then still clears the word-count gates on its body
    val repPhrase = "subscribe to our newsletter today"
    val repBody = (goodLines.map(l => l.replace("the", "that")) :+
      "the final line closes the page with a quiet full stop.")
      .mkString("\n")
    val repeaty = (Seq.fill(6)(repPhrase).mkString(" ") + ".\n") + repBody
    val rows = Seq(
      (1L, good, 100L),      // passes everything
      (2L, withBrace, 110L), // C4 page rule (brace) drops it
      (3L, withJs, 120L),    // C4 LINE rule cuts the javascript line only
      (4L, short, 130L),     // passes C4+quality, Gopher word count drops it
      (5L, good, 140L),      // exact dup of 1
      (6L, repeaty, 150L))   // repeated span collapsed, then kept
    val batch = graft.pipeline.CurationPipeline
      .run(rows.toDF("doc_id", "text", "secs"), "doc_id", "text",
        languages = Set("en"), c4Rules = true, gopherGate = true,
        repeatSpans = Some(2))
      .curated.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val input = MemoryStream[(Long, String, Long)](spark)
    val stream = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_seconds(col("_3")).as("ts"))
    val q = graft.pipeline.CurationPipeline
      .runStreaming(stream, "doc_id", "text", "ts", languages = Set("en"),
        c4Rules = true, gopherGate = true, repeatSpanWidth = Some(2))
      .select("doc_id", "text")
      .writeStream.format("memory").queryName("c4gopherparity")
      .outputMode("append").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      val streamKept = spark.table("c4gopherparity")
        .as[(Long, String)].collect().toMap
      assert(batch.keySet == Set(1L, 3L, 6L), s"batch kept ${batch.keySet}")
      assert(streamKept == batch,
        s"stream kept $streamKept, batch kept $batch")
      // the rewrites agree on BOTH paths: doc 3's javascript line cut,
      // then normalized by the repeat-span stage (lowercase tokens,
      // punctuation stripped, newlines joined); doc 6's repeated phrase
      // collapsed to one occurrence
      assert(batch(3L) == otherLines.map(_.dropRight(1)).mkString(" "),
        s"doc 3 should be the js-cut, normalized body: ${batch(3L)}")
      assert(batch(6L).sliding(repPhrase.length).count(
        _ == repPhrase) == 1,
        s"repeated phrase should survive exactly once: ${batch(6L)}")
    } finally q.stop()
  }

  test("exact-threshold gate runs per micro-batch and matches the batch gate") {
    // the Jaccard.thresholdGate scaladoc claim, executed: at ingest the
    // exact gate runs per micro-batch via foreachBatch against the
    // periodically compacted (static) index — the candidate anti-join
    // is stream-derived on both sides, which rules out the
    // single-pipeline form streamingLshGate uses. Decisions are
    // per-arrival vs the static index, so micro-batching must not
    // change them: the union of per-batch keeps == one batch gate.
    import graft.operators.Jaccard
    val indexed1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val indexed2 = "red orange yellow green blue indigo violet black white gray"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota nu"
    val unique = "engines pipelines tokens shuffles partitions broadcasts"
    val idx = Jaccard.dfOrderedSets(Jaccard.tokenized(
      Seq((100L, indexed1), (101L, indexed2)).toDF("docId", "text")))
      .localCheckpoint() // the compacted index IS materialized state
    val input = MemoryStream[(Long, String)](spark)
    val keptIds = scala.collection.mutable.ArrayBuffer[Long]()
    val q = input.toDF()
      .select(col("_1").as("docId"), col("_2").as("text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val kept = Jaccard.thresholdGate(Jaccard.tokenized(b), idx, 0.9)
          .select("docId").as[Long].collect()
        keptIds.synchronized { keptIds ++= kept }
        ()
      }.start()
    try {
      input.addData((21L, indexed1), // exact dup of 100 -> dropped
        (22L, unique))               // no shared tokens -> kept
      q.processAllAvailable()
      input.addData((23L, indexed2), // later batch, dup of 101 -> dropped
        (24L, near))                 // J = 9/11 = 0.82 < 0.9 -> kept
      q.processAllAvailable()
      val streamed = keptIds.synchronized(keptIds.toSet)
      assert(streamed == Set(22L, 24L), s"got $streamed")
      val batchKept = Jaccard.thresholdGate(
        Jaccard.tokenized(Seq((21L, indexed1), (22L, unique),
          (23L, indexed2), (24L, near)).toDF("docId", "text")), idx, 0.9)
        .select("docId").as[Long].collect().toSet
      assert(batchKept == streamed,
        s"stream/batch divergence: stream=$streamed batch=$batchKept")
    } finally q.stop()
  }

  test("full ingest loop: per-batch gate, admitted docs compacted into the index") {
    // the whole ingest convention executed end to end: each micro-batch
    // is gated by Jaccard.thresholdGate against the current index, and
    // the ADMITTED arrivals are folded in with Jaccard.compactIndex
    // (the periodic compaction collapsed to every batch here), so a
    // later arrival duplicating an EARLIER ADMITTED doc — not just an
    // originally-indexed one — is dropped. The final index must equal
    // the from-scratch rebuild over initial ∪ admitted.
    import graft.operators.Jaccard
    val indexed = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val newdoc = "engines pipelines tokens shuffles partitions broadcasts"
    val fresh = "completely different vocabulary entirely here now"
    val idx0 = Jaccard.dfOrderedSets(Jaccard.tokenized(
      Seq((100L, indexed)).toDF("docId", "text"))).localCheckpoint()
    @volatile var idx = idx0
    val input = MemoryStream[(Long, String)](spark)
    val keptIds = scala.collection.mutable.ArrayBuffer[Long]()
    val q = input.toDF()
      .select(col("_1").as("docId"), col("_2").as("text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // materialize the batch tokens once: the gate consumes them
        // twice and the compaction again (the landing-table rule)
        val toks = Jaccard.tokenized(b).localCheckpoint()
        val kept = Jaccard.thresholdGate(toks, idx, 0.9).localCheckpoint()
        keptIds.synchronized {
          keptIds ++= kept.select("docId").as[Long].collect() }
        idx = Jaccard.compactIndex(idx, kept).localCheckpoint()
        ()
      }.start()
    try {
      input.addData((21L, newdoc)) // no match in idx0 -> admitted
      q.processAllAvailable()
      input.addData(
        (22L, newdoc),  // dup of ADMITTED 21 -> dropped (post-compaction)
        (23L, fresh),   // novel -> admitted
        (24L, indexed)) // dup of the original index -> dropped
      q.processAllAvailable()
      assert(keptIds.synchronized(keptIds.toSet) == Set(21L, 23L),
        s"got ${keptIds.toSet}")
      // the compacted index IS the rebuild over initial + admitted
      val rebuilt = Jaccard.dfOrderedSets(Jaccard.tokenized(
        Seq((100L, indexed), (21L, newdoc), (23L, fresh))
          .toDF("docId", "text")))
      assert(IndexLayout.of(idx) == IndexLayout.of(rebuilt))
    } finally q.stop()
  }

  test("BM25 ingest loop: per-batch triple compaction probes like a rebuild") {
    // the retrieval-side ingest convention end to end: each micro-batch
    // appends through Retrieval.compactTermIndex into the persisted
    // (tf, df, stats) triple; the final triple must score queries
    // BITWISE like an index rebuilt from scratch over everything
    import graft.operators.Retrieval
    val d0 = Seq((1L, "apple banana apple"), (2L, "banana cherry"))
      .toDF("doc_id", "text")
    val tf0 = Retrieval.termFrequencies(d0, "doc_id", "text")
      .localCheckpoint()
    @volatile var triple = (tf0,
      Retrieval.dfTable(tf0).localCheckpoint(),
      Retrieval.corpusStats(tf0).localCheckpoint())
    val arrived = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // batchTf consumed 3x by the merge (the landing-table rule)
        val batchTf = Retrieval
          .termFrequencies(b, "doc_id", "text").localCheckpoint()
        arrived.synchronized {
          arrived ++= b.as[(Long, String)].collect() }
        val (tfM, dfM, stM) = Retrieval.compactTermIndex(
          triple._1, triple._2, triple._3, batchTf)
        triple = (tfM.localCheckpoint(), dfM.localCheckpoint(),
          stM.localCheckpoint())
        ()
      }.start()
    try {
      input.addData((11L, "cherry date"), (12L, "elder apple"))
      q.processAllAvailable()
      input.addData((13L, "banana elder fig"))
      q.processAllAvailable()
      val qs = Seq((100L, "apple banana fig"), (101L, "date"))
        .toDF("query_id", "text")
      val viaStream = Retrieval.bm25ScoresPrecomputed(
        triple._1, triple._2, triple._3, qs, "query_id", "text")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val viaRebuild = Retrieval.bm25Scores(
        d0.unionByName(arrived.synchronized(arrived.toSeq)
          .toDF("doc_id", "text")),
        "doc_id", "text", qs, "query_id", "text")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(viaStream === viaRebuild) // bitwise
      assert(viaStream.keySet.map(_._2).contains(13L))
    } finally q.stop()
  }

  test("retrieval ingest loop: triple + positional compaction probe like rebuilds") {
    // the WHOLE retrieval index family through one foreachBatch ingest
    // loop — the BM25 (tf, df, stats) triple and the positional table
    // compact per micro-batch; after N batches a top-k probe and a
    // phrase probe through the carried state must equal probes through
    // from-scratch rebuilds, and a post-hoc deletion compaction must
    // equal the survivor rebuilds (the full index lifecycle)
    import graft.operators.Retrieval
    val d0 = Seq((1L, "apple banana apple cherry"),
      (2L, "banana cherry date")).toDF("doc_id", "text")
    val tf0 = Retrieval.termFrequencies(d0, "doc_id", "text")
      .localCheckpoint()
    @volatile var triple = (tf0,
      Retrieval.dfTable(tf0).localCheckpoint(),
      Retrieval.corpusStats(tf0).localCheckpoint())
    @volatile var posts = Retrieval
      .positionalPostings(d0, "doc_id", "text").localCheckpoint()
    val arrived = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // the batch feeds BOTH tokenizer passes + the audit collect
        val bb = b.localCheckpoint()
        val batchTf = Retrieval
          .termFrequencies(bb, "doc_id", "text").localCheckpoint()
        arrived.synchronized {
          arrived ++= bb.as[(Long, String)].collect() }
        val (tfM, dfM, stM) = Retrieval.compactTermIndex(
          triple._1, triple._2, triple._3, batchTf,
          assertDisjoint = true)
        triple = (tfM.localCheckpoint(), dfM.localCheckpoint(),
          stM.localCheckpoint())
        posts = Retrieval.compactPositionalIndex(posts,
          Retrieval.positionalPostings(bb, "doc_id", "text"))
          .localCheckpoint()
        ()
      }.start()
    try {
      input.addData((11L, "cherry date banana cherry"),
        (12L, "elder apple banana"))
      q.processAllAvailable()
      input.addData((13L, "banana cherry fig"))
      q.processAllAvailable()
      val all = d0.unionByName(
        arrived.synchronized(arrived.toSeq).toDF("doc_id", "text"))
        .localCheckpoint()
      val qs = Seq((100L, "apple banana fig"), (101L, "date"))
        .toDF("query_id", "text")
      val phr = Seq((200L, "banana cherry")).toDF("query_id", "text")
      def topk(tf: org.apache.spark.sql.DataFrame,
               dfT: org.apache.spark.sql.DataFrame,
               st: org.apache.spark.sql.DataFrame) =
        Retrieval.bm25TopK(Retrieval.bm25ScoresPrecomputed(
          tf, dfT, st, qs, "query_id", "text"), 3)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            (r.getDouble(2), r.getInt(3))).toMap
      def occ(p: org.apache.spark.sql.DataFrame) =
        Retrieval.phraseMatches(p, phr, "query_id", "text")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // append parity: carried state == rebuild over everything
      val tfAll = Retrieval.termFrequencies(all, "doc_id", "text")
        .localCheckpoint()
      assert(topk(triple._1, triple._2, triple._3) ===
        topk(tfAll, Retrieval.dfTable(tfAll),
          Retrieval.corpusStats(tfAll))) // bitwise
      assert(occ(posts) ===
        occ(Retrieval.positionalPostings(all, "doc_id", "text")))
      // deletion parity: compact doc 11 out == survivor rebuilds
      val del = Seq(11L).toDF("docId").localCheckpoint()
      val (tfD, dfD, stD) = Retrieval.compactTermIndexDeleted(
        triple._1, triple._2, triple._3, del)
      val postsD = Retrieval.compactPositionalIndexDeleted(posts, del)
      val surv = all.filter(col("doc_id") =!= 11L).localCheckpoint()
      val tfS = Retrieval.termFrequencies(surv, "doc_id", "text")
        .localCheckpoint()
      assert(topk(tfD, dfD, stD) ===
        topk(tfS, Retrieval.dfTable(tfS), Retrieval.corpusStats(tfS)))
      assert(occ(postsD) ===
        occ(Retrieval.positionalPostings(surv, "doc_id", "text")))
    } finally q.stop()
  }

  test("impact metadata ingest: per-batch max/min merges match the rebuild " +
    "and keep WAND exact") {
    // the pruning metadata through the same foreachBatch convention:
    // impactStats merges per micro-batch via compactImpactStats beside
    // the (tf, df, stats) triple; after N batches the carried table
    // must equal a from-scratch rebuild ROW FOR ROW, and a WAND probe
    // through the carried state + carried metadata must equal the
    // unpruned ranking (the q204 exactness, now over streamed state)
    import graft.operators.Retrieval
    val d0 = Seq((1L, "apple banana apple cherry"),
      (2L, "banana cherry date")).toDF("doc_id", "text")
    val tf0 = Retrieval.termFrequencies(d0, "doc_id", "text")
      .localCheckpoint()
    @volatile var triple = (tf0,
      Retrieval.dfTable(tf0).localCheckpoint(),
      Retrieval.corpusStats(tf0).localCheckpoint())
    @volatile var impact = Retrieval.impactStats(tf0).localCheckpoint()
    val arrived = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val batchTf = Retrieval
          .termFrequencies(b, "doc_id", "text").localCheckpoint()
        arrived.synchronized {
          arrived ++= b.as[(Long, String)].collect() }
        val (tfM, dfM, stM) = Retrieval.compactTermIndex(
          triple._1, triple._2, triple._3, batchTf)
        triple = (tfM.localCheckpoint(), dfM.localCheckpoint(),
          stM.localCheckpoint())
        impact = Retrieval.compactImpactStats(impact,
          Retrieval.impactStats(batchTf)).localCheckpoint()
        ()
      }.start()
    try {
      input.addData((11L, "cherry date banana cherry apple apple"),
        (12L, "elder apple banana"))
      q.processAllAvailable()
      input.addData((13L, "banana cherry fig"))
      q.processAllAvailable()
      val all = d0.unionByName(
        arrived.synchronized(arrived.toSeq).toDF("doc_id", "text"))
        .localCheckpoint()
      val tfAll = Retrieval.termFrequencies(all, "doc_id", "text")
        .localCheckpoint()
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows(impact) === rows(Retrieval.impactStats(tfAll)))
      val qs = Seq((100L, "apple banana fig"), (101L, "cherry date"))
        .toDF("query_id", "text")
      def topk(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getDouble(2), r.getInt(3))).toMap
      val unpruned = topk(Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(triple._1, triple._2, triple._3,
          qs, "query_id", "text"), 3))
      for (hotDf <- Seq(0L, 2L, 100L))
        assert(topk(Retrieval.bm25TopKWand(triple._1, qs,
          "query_id", "text", k = 3, hotDf = hotDf,
          dfStats = Some((triple._2, triple._3)),
          impact = Some(impact))) === unpruned, s"hotDf=$hotDf")
    } finally q.stop()
  }

  test("champion tier ingest: per-batch max-merges + a deletion match " +
    "the rebuild and keep tiered serving exact") {
    // the LAST persisted retrieval layout through the foreachBatch
    // convention: the champion table compacts per micro-batch via
    // compactChampionPostings beside the (tf, df, stats) triple;
    // after N batches the carried table must equal a from-scratch
    // championPostings rebuild ROW FOR ROW, a post-hoc deletion must
    // equal the survivor rebuild, and a tiered probe through the
    // carried state must equal one through the rebuilds
    import graft.operators.Retrieval
    val m = 2
    val d0 = Seq((1L, "apple banana apple cherry"),
      (2L, "banana cherry date")).toDF("doc_id", "text")
    val tf0 = Retrieval.termFrequencies(d0, "doc_id", "text")
      .localCheckpoint()
    @volatile var triple = (tf0,
      Retrieval.dfTable(tf0).localCheckpoint(),
      Retrieval.corpusStats(tf0).localCheckpoint())
    @volatile var champ = Retrieval.championPostings(tf0, m)
      .localCheckpoint()
    val arrived = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val batchTf = Retrieval
          .termFrequencies(b, "doc_id", "text").localCheckpoint()
        arrived.synchronized {
          arrived ++= b.as[(Long, String)].collect() }
        val (tfM, dfM, stM) = Retrieval.compactTermIndex(
          triple._1, triple._2, triple._3, batchTf)
        triple = (tfM.localCheckpoint(), dfM.localCheckpoint(),
          stM.localCheckpoint())
        champ = Retrieval.compactChampionPostings(champ, batchTf, m)
          .localCheckpoint()
        ()
      }.start()
    try {
      input.addData((11L, "cherry date banana cherry apple apple"),
        (12L, "elder apple banana"))
      q.processAllAvailable()
      input.addData((13L, "banana cherry fig"))
      q.processAllAvailable()
      val all = d0.unionByName(
        arrived.synchronized(arrived.toSeq).toDF("doc_id", "text"))
        .localCheckpoint()
      val tfAll = Retrieval.termFrequencies(all, "doc_id", "text")
        .localCheckpoint()
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.select(col("docId"), col("dl"), col("word"), col("tf"))
          .collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
          .toSet
      assert(rows(champ) === rows(Retrieval.championPostings(tfAll, m)))
      val qs = Seq((100L, "apple banana"), (101L, "fig"))
        .toDF("query_id", "text")
      def tiered(ch: org.apache.spark.sql.DataFrame,
                 tf: org.apache.spark.sql.DataFrame,
                 dfT: org.apache.spark.sql.DataFrame,
                 st: org.apache.spark.sql.DataFrame) =
        Retrieval.bm25TopKTiered(ch, tf, dfT, st, qs,
          "query_id", "text", k = 3).collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            (r.getDouble(2), r.getInt(3), r.getLong(4))).toMap
      assert(tiered(champ, triple._1, triple._2, triple._3) ===
        tiered(Retrieval.championPostings(tfAll, m), tfAll,
          Retrieval.dfTable(tfAll), Retrieval.corpusStats(tfAll)))
      // deletion parity: compact doc 11 out == survivor rebuild
      val del = Seq(11L).toDF("docId").localCheckpoint()
      val champD = Retrieval.compactChampionPostingsDeleted(champ,
        triple._1, del, m)
      val surv = all.filter(col("doc_id") =!= 11L).localCheckpoint()
      val tfS = Retrieval.termFrequencies(surv, "doc_id", "text")
        .localCheckpoint()
      assert(rows(champD) === rows(Retrieval.championPostings(tfS, m)))
    } finally q.stop()
  }

  test("streaming queries score against the static index like batch") {
    // the SERVING side of the retrieval story (the ingest loop covers
    // the index side): queries arrive as a stream, each micro-batch
    // scores against the persisted (tf, df, stats) triple via
    // foreachBatch, and the accumulated top-k equals the batch run
    // over the same query set — same plans, same folds, per batch
    import graft.operators.Retrieval
    val corpus = (1L to 40L).map { id =>
      id -> s"apple banana tok${id % 7} tok${id % 5} cherry"
    }.toDF("doc_id", "text")
    val tf = Retrieval.termFrequencies(corpus, "doc_id", "text")
      .localCheckpoint()
    val dfT = Retrieval.dfTable(tf).localCheckpoint()
    val st = Retrieval.corpusStats(tf).localCheckpoint()
    val served = scala.collection.mutable.ArrayBuffer[(Long, Long,
      Double, Int)]()
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF()
      .select(col("_1").as("query_id"), col("_2").as("text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = Retrieval.bm25TopK(
          Retrieval.bm25ScoresPrecomputed(tf, dfT, st,
            b, "query_id", "text"), 3)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getInt(3)))
        served.synchronized { served ++= rows }
        ()
      }.start()
    try {
      input.addData((100L, "apple cherry"), (101L, "tok3 banana"))
      q.processAllAvailable()
      input.addData((102L, "tok6"))
      q.processAllAvailable()
      val batchQs = Seq((100L, "apple cherry"), (101L, "tok3 banana"),
        (102L, "tok6")).toDF("query_id", "text")
      val viaBatch = Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tf, dfT, st,
          batchQs, "query_id", "text"), 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      assert(served.synchronized(served.toSet) === viaBatch) // bitwise
      assert(viaBatch.map(_._1) === Set(100L, 101L, 102L))
    } finally q.stop()
  }

  test("streaming queries serve through the round-17 entry points like " +
    "batch (QL WAND + tiered)") {
    // the serving-parity claim for the new pruned/tiered paths:
    // per-micro-batch qlTopKWand and bm25TopKTiered (WAND tier-2)
    // against the persisted layouts must accumulate to exactly the
    // batch run — routing included, since WAND routing is per-query
    // and tiered fill counts are per-query too (no cross-batch state)
    import graft.operators.Retrieval
    val corpus = (1L to 40L).map { id =>
      id -> s"apple banana tok${id % 7} tok${id % 5} cherry"
    }.toDF("doc_id", "text")
    val tf = Retrieval.termFrequencies(corpus, "doc_id", "text")
      .localCheckpoint()
    val dfT = Retrieval.dfTable(tf).localCheckpoint()
    val cfT = Retrieval.cfTable(tf).localCheckpoint()
    val st = Retrieval.corpusStats(tf).localCheckpoint()
    val imp = Retrieval.impactStats(tf).localCheckpoint()
    val champ = Retrieval.championPostings(tf, m = 2).localCheckpoint()
    val qlServed = scala.collection.mutable
      .ArrayBuffer[(Long, Long, Double, Int)]()
    val tierServed = scala.collection.mutable
      .ArrayBuffer[(Long, Long, Double, Int, Long)]()
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF()
      .select(col("_1").as("query_id"), col("_2").as("text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val bb = b.localCheckpoint() // consumed by both entry points
        qlServed.synchronized {
          qlServed ++= Retrieval.qlTopKWand(tf, bb, "query_id", "text",
            k = 3, hotDf = 10L, dfStats = Some((dfT, st)),
            cf = Some(cfT), impact = Some(imp)).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
              r.getInt(3)))
        }
        tierServed.synchronized {
          tierServed ++= Retrieval.bm25TopKTiered(champ, tf, dfT, st,
            bb, "query_id", "text", k = 3, hotDf = Some(10L),
            impact = Some(imp)).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
              r.getInt(3), r.getLong(4)))
        }
        ()
      }.start()
    try {
      input.addData((100L, "apple cherry"), (101L, "tok3 banana"))
      q.processAllAvailable()
      input.addData((102L, "tok6"))
      q.processAllAvailable()
      val batchQs = Seq((100L, "apple cherry"), (101L, "tok3 banana"),
        (102L, "tok6")).toDF("query_id", "text")
      val qlBatch = Retrieval.qlTopKWand(tf, batchQs, "query_id", "text",
        k = 3, hotDf = 10L, dfStats = Some((dfT, st)),
        cf = Some(cfT), impact = Some(imp)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      assert(qlServed.synchronized(qlServed.toSet) === qlBatch) // bitwise
      val tierBatch = Retrieval.bm25TopKTiered(champ, tf, dfT, st,
        batchQs, "query_id", "text", k = 3, hotDf = Some(10L),
        impact = Some(imp)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3), r.getLong(4))).toSet
      assert(tierServed.synchronized(tierServed.toSet) === tierBatch)
      assert(tierBatch.map(_._1) === Set(100L, 101L, 102L))
    } finally q.stop()
  }

  test("batch and streaming sessionization agree on on-time data") {
    val batch = EventStreams.sessionize(
      Seq((7L, 1000L, 1L), (7L, 1500L, 2L), (7L, 4000L, 3L), (8L, 900L, 4L))
        .toDF("user_id", "secs", "event_id")
        .select(col("user_id"), timestamp_seconds(col("secs")).as("ts"),
          col("event_id")),
      gapSeconds = 1800L)
      .select("user_id", "session_id", "n_events", "sess_start", "sess_end")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(batch == Set(
      (7L, 1L, 2L, 1000L, 1500L),
      (7L, 2L, 1L, 4000L, 4000L),
      (8L, 1L, 1L, 900L, 900L)))
  }

  test("passage-index ingest loop: per-batch layout compaction + a " +
    "deletion probe like a rebuild on the survivors") {
    // the r18 passage layout rides the same ingest convention as the
    // word index: each micro-batch segments ITSELF and compacts into
    // the persisted four-table layout; a post-stream deletion goes
    // through the membership-resolved subtractive merge; the final
    // layout must probe BITWISE like a fresh build on the survivors
    import graft.operators.{Passages, Retrieval}
    def ckpt(l: Passages.PassageLayout): Passages.PassageLayout =
      Passages.PassageLayout(l.tf.localCheckpoint(),
        l.dfTab.localCheckpoint(), l.stats.localCheckpoint(),
        l.membership.localCheckpoint())
    val d0 = Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")),
      (2L, "apple banana cherry apple")).toDF("doc_id", "text")
    @volatile var layout = ckpt(
      Passages.passageIndex(d0, "doc_id", "text", width = 8, stride = 4))
    val arrived = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        arrived.synchronized {
          arrived ++= b.as[(Long, String)].collect() }
        layout = ckpt(Passages.compactPassageIndex(layout, b,
          "doc_id", "text", width = 8, stride = 4))
        ()
      }.start()
    try {
      input.addData((11L, (1 to 12).map(i => s"w$i").mkString(" ")),
        (12L, "banana date elder apple fig"))
      q.processAllAvailable()
      input.addData((13L, "cherry fig " +
        (5 to 16).map(i => s"w$i").mkString(" ")))
      q.processAllAvailable()
      // deletion: doc 12 leaves through the membership-resolved merge
      val fin = ckpt(Passages.compactPassageIndexDeleted(layout,
        Seq(12L).toDF("docId")))
      val qs = Seq((100L, "apple w5 fig"), (101L, "w1 cherry"))
        .toDF("query_id", "text")
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.select("queryId", "docId", "score", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getInt(3))).toSet
      val viaStream = rows(
        Passages.maxPassageTopK(fin, qs, "query_id", "text", k = 3))
      val survivors = d0
        .unionByName(arrived.synchronized(arrived.toSeq)
          .toDF("doc_id", "text"))
        .filter(col("doc_id") =!= 12L)
      val viaRebuild = rows(Passages.maxPassageTopK(
        Passages.passageIndex(survivors, "doc_id", "text", 8, 4),
        qs, "query_id", "text", k = 3))
      assert(viaStream === viaRebuild) // bitwise
      assert(viaStream.map(_._2).contains(13L))
      assert(!viaStream.map(_._2).contains(12L))
    } finally q.stop()
  }

  test("streaming queries serve through the round-18 entry points like " +
    "batch (passage MaxP + federated + routed weighted QL + fielded WAND)") {
    // the serving-parity claim extended to the round-18 surface:
    // per-micro-batch probes through the persisted passage layout,
    // the CORI-selected shard federation, the routed weighted QL
    // path (forced onto its WAND branch), and fielded BM25F WAND
    // must accumulate to exactly the batch run — every routing
    // decision here is per-query, so batching cannot change answers
    import graft.operators.{Federation, Passages, Retrieval}
    val corpus = (1L to 40L).map { id =>
      id -> (s"apple banana tok${id % 7} tok${id % 5} cherry date " +
        s"elder fig tok${id % 3} grape")
    }.toDF("doc_id", "text")
    val pl0 = Passages.passageIndex(corpus, "doc_id", "text",
      width = 4, stride = 2)
    val pl = Passages.PassageLayout(pl0.tf.localCheckpoint(),
      pl0.dfTab.localCheckpoint(), pl0.stats.localCheckpoint(),
      pl0.membership.localCheckpoint())
    val tf = Retrieval.termFrequencies(corpus, "doc_id", "text")
      .localCheckpoint()
    val dfT = Retrieval.dfTable(tf).localCheckpoint()
    val cfT = Retrieval.cfTable(tf).localCheckpoint()
    val st = Retrieval.corpusStats(tf).localCheckpoint()
    val imp = Retrieval.impactStats(tf).localCheckpoint()
    val shards = corpus.select(col("doc_id").as("docId"),
      pmod(col("doc_id"), lit(3)).as("shard"))
    val shardTf = tf.join(shards, Seq("docId"))
      .select(col("shard"), col("docId"), col("dl"), col("word"),
        col("tf")).localCheckpoint()
    val sdf = Federation.shardTermStats(tf, shards).localCheckpoint()
    val scw = Federation.shardSizes(tf, shards).localCheckpoint()
    val fielded = corpus.select(col("doc_id"), lit("title").as("field"),
      substring(col("text"), 1, 12).as("ftext"))
      .unionByName(corpus.select(col("doc_id"), lit("body").as("field"),
        substring(col("text"), 13, 1 << 30).as("ftext")))
    val ftf = Retrieval.termFrequenciesFielded(fielded,
      "doc_id", "field", "ftext").localCheckpoint()
    val impF = Retrieval.impactStatsFielded(ftf).localCheckpoint()
    val fparams = Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75))
    def tw(qs: org.apache.spark.sql.DataFrame) = qs
      .select(col("query_id").as("queryId"),
        explode(split(col("text"), " ")).as("word"))
      .distinct().withColumn("weight", lit(1.0))
    val passServed = scala.collection.mutable
      .ArrayBuffer[(Long, Long, Double, Int)]()
    val fedServed = scala.collection.mutable
      .ArrayBuffer[(Long, Long, Double, Int)]()
    val qlwServed = scala.collection.mutable
      .ArrayBuffer[(Long, Long, Double, Int)]()
    val ffServed = scala.collection.mutable
      .ArrayBuffer[(Long, Long, Double, Int)]()
    def quad(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF()
      .select(col("_1").as("query_id"), col("_2").as("text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val bb = b.localCheckpoint() // consumed by all four entry points
        passServed.synchronized { passServed ++=
          Passages.maxPassageTopK(pl, bb, "query_id", "text", k = 3)
            .collect().map(quad) }
        fedServed.synchronized { fedServed ++=
          Federation.coriTopK(shardTf, sdf, scw, dfT, st, bb,
            "query_id", "text", k = 3, nProbe = 2)
            .collect().map(quad) }
        qlwServed.synchronized { qlwServed ++=
          Retrieval.qlTopKWandWeightedRouted(tf, tw(bb), k = 3,
            hotDf = Some(10L), minWandDocs = 1L,
            dfStats = Some((dfT, st)), cf = Some(cfT),
            impact = Some(imp)).collect().map(quad) }
        ffServed.synchronized { ffServed ++=
          Retrieval.bm25fTopKWand(ftf, fparams, bb, "query_id", "text",
            k = 3, hotDf = 10L, impactF = Some(impF))
            .collect().map(quad) }
        ()
      }.start()
    try {
      input.addData((100L, "apple cherry"), (101L, "tok3 banana grape"))
      q.processAllAvailable()
      input.addData((102L, "tok6 fig"))
      q.processAllAvailable()
      val batchQs = Seq((100L, "apple cherry"),
        (101L, "tok3 banana grape"), (102L, "tok6 fig"))
        .toDF("query_id", "text")
      assert(passServed.synchronized(passServed.toSet) ===
        Passages.maxPassageTopK(pl, batchQs, "query_id", "text", k = 3)
          .collect().map(quad).toSet) // bitwise
      assert(fedServed.synchronized(fedServed.toSet) ===
        Federation.coriTopK(shardTf, sdf, scw, dfT, st, batchQs,
          "query_id", "text", k = 3, nProbe = 2)
          .collect().map(quad).toSet) // bitwise
      assert(qlwServed.synchronized(qlwServed.toSet) ===
        Retrieval.qlTopKWandWeightedRouted(tf, tw(batchQs), k = 3,
          hotDf = Some(10L), minWandDocs = 1L,
          dfStats = Some((dfT, st)), cf = Some(cfT),
          impact = Some(imp)).collect().map(quad).toSet) // bitwise
      assert(ffServed.synchronized(ffServed.toSet) ===
        Retrieval.bm25fTopKWand(ftf, fparams, batchQs,
          "query_id", "text", k = 3, hotDf = 10L,
          impactF = Some(impF)).collect().map(quad).toSet) // bitwise
      assert(passServed.synchronized(passServed.map(_._1).toSet) ===
        Set(100L, 101L, 102L))
    } finally q.stop()
  }

  test("fielded-stats ingest loop: per-batch triple compaction probes " +
    "BM25F like a rebuild") {
    // the r18 fielded stat layout rides the same ingest convention:
    // each micro-batch's fielded tf appends and its stat triple
    // merges additively; the final precomputed probe must score
    // BITWISE like a fresh build over everything
    import graft.operators.Retrieval
    def fieldedOf(d: org.apache.spark.sql.DataFrame) =
      d.select(col("doc_id"), lit("title").as("field"),
        substring(col("text"), 1, 12).as("ftext"))
        .unionByName(d.select(col("doc_id"), lit("body").as("field"),
          substring(col("text"), 13, 1 << 30).as("ftext")))
    val d0 = Seq((1L, "apple banana apple cherry date"),
      (2L, "banana cherry elder fig grape")).toDF("doc_id", "text")
    val f0 = Retrieval.termFrequenciesFielded(fieldedOf(d0),
      "doc_id", "field", "ftext").localCheckpoint()
    @volatile var state = (f0,
      Retrieval.fieldedFieldStats(f0).localCheckpoint(),
      Retrieval.fieldedDocStats(f0).localCheckpoint(),
      Retrieval.fieldedDfTable(f0).localCheckpoint())
    val arrived = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val bf = Retrieval.termFrequenciesFielded(fieldedOf(b),
          "doc_id", "field", "ftext").localCheckpoint()
        arrived.synchronized {
          arrived ++= b.as[(Long, String)].collect() }
        val (fsM, dsM, dfM) = Retrieval.compactFieldedStats(
          state._2, state._3, state._4,
          Retrieval.fieldedFieldStats(bf),
          Retrieval.fieldedDocStats(bf),
          Retrieval.fieldedDfTable(bf))
        state = (state._1.unionByName(bf).localCheckpoint(),
          fsM.localCheckpoint(), dsM.localCheckpoint(),
          dfM.localCheckpoint())
        ()
      }.start()
    try {
      input.addData((11L, "cherry date apple elder banana fig"),
        (12L, "elder apple grape banana cherry date"))
      q.processAllAvailable()
      input.addData((13L, "banana elder fig apple grape cherry"))
      q.processAllAvailable()
      val qs = Seq((100L, "apple banana fig"), (101L, "date grape"))
        .toDF("query_id", "text")
      val params = Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75))
      val viaStream = Retrieval.bm25fScores(state._1, params, qs,
        "query_id", "text",
        fStats = Some((state._2, state._3, state._4))).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val rebuilt = Retrieval.termFrequenciesFielded(
        fieldedOf(d0.unionByName(arrived.synchronized(arrived.toSeq)
          .toDF("doc_id", "text"))), "doc_id", "field", "ftext")
      val viaRebuild = Retrieval.bm25fScores(rebuilt, params, qs,
        "query_id", "text").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(viaStream === viaRebuild) // bitwise
      assert(viaStream.keySet.map(_._2).contains(13L))
    } finally q.stop()
  }
}
