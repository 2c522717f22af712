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

  test("stateful sessionizer: gap closes sessions, timeout flushes idle ones") {
    val input = MemoryStream[(Long, Long, Long)](spark)
    val q = EventStreams
      .sessionizeStream(eventsFrom(input),
        gapSeconds = 1800L, lateness = "10 minutes")
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      val t0 = 100000L
      // user 7: two events 10 min apart (one session), then a gap > 30 min
      input.addData((7L, t0, 1L), (7L, t0 + 600, 2L))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0, "open session must not emit")

      // event past the gap closes session 1 in-line and opens session 2
      input.addData((7L, t0 + 600 + 1801, 3L))
      q.processAllAvailable()
      val s1 = spark.table("sess")
        .as[EventStreams.Session].collect().toSeq
      assert(s1 == Seq(
        EventStreams.Session(7L, 1L, 2L, t0, t0 + 600)))

      // advance event time far ahead via another user: watermark passes
      // session-2's timeout → it flushes without any new user-7 event
      input.addData((9L, t0 + 20000, 4L))
      q.processAllAvailable()
      input.addData((9L, t0 + 40000, 5L))
      q.processAllAvailable()
      val all = spark.table("sess").as[EventStreams.Session].collect().toSet
      assert(all.contains(
        EventStreams.Session(7L, 2L, 1L, t0 + 2401, t0 + 2401)),
        s"idle session must flush on event-time timeout; got $all")
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
}
