package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators. Each transformation is written once and works
  * in BOTH batch and Structured Streaming mode (same DataFrame code path —
  * the micro-batch engine re-plans it incrementally), which is how the
  * engine keeps its batch oracle and its streaming deployment in sync.
  */
object EventStreams {

  /** Tumbling-window counts + value sums per event type. In streaming
    * mode, combine with `withWatermark` (see `streamingWindowedCounts`).
    * Output: window_start (epoch s), event_type, n_events, sum_value.
    */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** The same aggregation as a streaming query with a watermark: late rows
    * beyond `lateness` are dropped and window state is reclaimed — the
    * knob that makes this runnable indefinitely at scale.
    */
  def streamingWindowedCounts(events: DataFrame, windowLength: String = "1 hour",
                              lateness: String = "2 hours"): DataFrame =
    windowedCounts(events.withWatermark("ts", lateness), windowLength)

  /** One emitted session row (streaming sessionizer output). */
  case class Session(user_id: Long, session_id: Long, n_events: Long,
                     sess_start: Long, sess_end: Long)

  /** One still-open session interval. */
  case class OpenInterval(start: Long, end: Long, n: Long)

  /** Per-user sessionizer state: the next ordinal session id plus every
    * open interval inside the watermark horizon, sorted by start.
    */
  case class UserSessions(nextId: Long, open: List[OpenInterval])

  /** Streaming sessionization with custom merging state
    * (`flatMapGroupsWithState` + event-time timeout).
    *
    * The state holds ALL open session intervals per user (not just the
    * latest): micro-batches deliver events out of order across batches,
    * so an in-watermark event may open an earlier interval, extend any
    * open one, or BRIDGE two adjacent ones into a single session — the
    * same merge semantics as the built-in `session_window`, plus batch-
    * compatible ordinal session ids.
    *
    * A session is emitted only when the event-time watermark passes
    * `end + gap` — at that point no in-watermark event can extend it, so
    * emitted rows are final (append mode). Because the watermark is
    * monotone and intervals per user are disjoint with > gap spacing,
    * sessions flush in start order, which is exactly the batch
    * `sessionize` numbering for on-time data. The per-user state is
    * bounded: intervals leave at the watermark; the id counter is
    * retained `counterRetention` of event time past the last flush so
    * numbering survives idle gaps, then the state is dropped entirely.
    */
  def sessionizeStream(events: DataFrame, gapSeconds: Long = 1800L,
                       lateness: String = "1 hour",
                       counterRetention: java.time.Duration =
                         java.time.Duration.ofDays(7)): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    def insert(open: List[OpenInterval], secs: Long): List[OpenInterval] = {
      // neighbors within gap merge with the event (at most two: the
      // interval ending just before it and the one starting just after)
      val (near, far) = open.partition(iv =>
        secs >= iv.start - gapSeconds && secs <= iv.end + gapSeconds)
      val merged = near.foldLeft(OpenInterval(secs, secs, 1L)) { (acc, iv) =>
        OpenInterval(math.min(acc.start, iv.start),
          math.max(acc.end, iv.end), acc.n + iv.n)
      }
      (merged :: far).sortBy(_.start)
    }

    def flush(userId: Long, st: UserSessions, watermarkSecs: Long)
        : (UserSessions, List[Session]) = {
      val (done, still) = st.open.partition(_.end + gapSeconds < watermarkSecs)
      val out = done.zipWithIndex.map { case (iv, i) =>
        Session(userId, st.nextId + i, iv.n, iv.start, iv.end)
      }
      (UserSessions(st.nextId + done.size, still), out)
    }

    def fn(userId: Long, rows: Iterator[(Long, Long)],
           state: GroupState[UserSessions]): Iterator[Session] = {
      val watermarkSecs = state.getCurrentWatermarkMs() / 1000L
      val prev = state.getOption.getOrElse(UserSessions(1L, Nil))
      val withEvents =
        if (state.hasTimedOut) prev
        else rows.toSeq.map(_._1).sorted
          .foldLeft(prev)((st, secs) => st.copy(open = insert(st.open, secs)))
      val (next, out) = flush(userId, withEvents, watermarkSecs)
      if (next.open.nonEmpty) {
        state.update(next)
        // fire when the earliest open interval becomes flushable. flush
        // needs watermarkSecs > end+gap at SECOND granularity (an event
        // at second end+gap may still merge while the ms-watermark is
        // inside that second), so arm at the start of second end+gap+1 —
        // arming at end*1000+gapMs exactly would fire one batch too
        // early, flush nothing, and wait for yet another batch
        val earliest = (next.open.map(_.end).min + gapSeconds + 1) * 1000L
        state.setTimeoutTimestamp(
          math.max(earliest, state.getCurrentWatermarkMs() + 1))
      } else if (state.hasTimedOut && out.isEmpty) {
        state.remove() // retention timeout on a counter-only state
      } else {
        state.update(next) // keep the id counter through idle gaps
        state.setTimeoutTimestamp(
          state.getCurrentWatermarkMs() + counterRetention.toMillis)
      }
      out.iterator
    }

    // the watermarked `ts` column itself must survive up to the stateful
    // operator for the event-time timeout to bind to it
    events
      .withWatermark("ts", lateness)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
         st: GroupState[UserSessions]) =>
          fn(user, it.map(r => (r._2.getTime / 1000L, r._3)), st)
      }
  }

  /** Stream-stream interval join: each left-stream row matched to
    * same-key right-stream rows whose event time falls in
    * `[left.ts - beforeSeconds, left.ts]`. Both inputs are watermarked,
    * and the time-range condition bounds event time in BOTH directions
    * (`right.ts <= left.ts` and `left.ts <= right.ts + before`), so the
    * engine can prune each side's buffered state as the watermark
    * advances — the requirement that keeps stream-stream join state
    * bounded at scale. Batch counterpart (same results on static input):
    * `TemporalJoins.rangeJoin(..., maxBefore, maxAfter = 0)`.
    *
    * Inputs are event frames (`user_id`, `event_id`, `ts`); output:
    * (user_id, id_l, secs_l, id_r, secs_r) matching `rangeJoin`.
    */
  def streamingIntervalJoin(left: DataFrame, right: DataFrame,
                            beforeSeconds: Long,
                            lateness: String = "10 minutes"): DataFrame = {
    val l = left
      .select(col("user_id"), col("event_id").as("id_l"), col("ts").as("ts_l"))
      .withWatermark("ts_l", lateness)
    val r = right
      .select(col("user_id").as("user_r"), col("event_id").as("id_r"),
        col("ts").as("ts_r"))
      .withWatermark("ts_r", lateness)
    l.join(r,
        col("user_id") === col("user_r") &&
          col("ts_r") >= col("ts_l") - expr(s"INTERVAL $beforeSeconds SECONDS") &&
          col("ts_r") <= col("ts_l"))
      .select(col("user_id"), col("id_l"),
        unix_timestamp(col("ts_l")).as("secs_l"),
        col("id_r"), unix_timestamp(col("ts_r")).as("secs_r"))
  }

  /** Sessionization: a new session starts after `gapSeconds` of user
    * inactivity. Batch formulation (lag + running sum). Output one row per
    * session: user_id, session_id, n_events, sess_start, sess_end (epoch s).
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    // order by whole seconds + event_id (not raw ts): sub-second timestamp
    // precision differs across engines/parquet readers, so the oracle-safe
    // deterministic ordering is (second, event_id)
    val secs = unix_timestamp(col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(secs, col("event_id"))
    events
      .withColumn("secs", secs)
      .withColumn("prev_secs", lag(col("secs"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_secs").isNull ||
          col("secs") - col("prev_secs") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("secs")).as("sess_start"),
        max(col("secs")).as("sess_end"))
  }
}
