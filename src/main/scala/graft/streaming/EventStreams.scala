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

  /** Open-session state carried between micro-batches per user. */
  case class OpenSession(nextId: Long, start: Long, last: Long, n: Long)

  /** Streaming sessionization with custom state: gap-based sessions via
    * `flatMapGroupsWithState` + event-time timeout. A session CLOSES (and
    * is emitted, append-mode) either when a later event arrives past the
    * gap, or when the event-time watermark passes `last + gap` with no new
    * events (the timeout path — without it a user who goes quiet would
    * hold state forever; this is the knob that bounds state at scale).
    *
    * Within one uninterrupted run the (user_id, session_id, counts,
    * bounds) agree with the batch `sessionize` for on-time data; late rows
    * beyond the watermark are dropped by the engine, which is the
    * documented streaming-vs-batch divergence.
    */
  def sessionizeStream(events: DataFrame, gapSeconds: Long = 1800L,
                       lateness: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    def fn(userId: Long, rows: Iterator[(Long, Long)],
           state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(Session(userId, s.nextId, s.n, s.start, s.last))
      } else {
        // micro-batches are unordered within the batch — sort by
        // (secs, event_id), the same deterministic order the batch
        // formulation uses
        val sorted = rows.toSeq.sortBy(identity).map(_._1)
        var open = state.getOption
        val closed = Seq.newBuilder[Session]
        sorted.foreach { secs =>
          open match {
            case Some(s) if secs - s.last <= gapSeconds =>
              open = Some(s.copy(last = math.max(s.last, secs), n = s.n + 1))
            case Some(s) =>
              closed += Session(userId, s.nextId, s.n, s.start, s.last)
              open = Some(OpenSession(s.nextId + 1, secs, secs, 1L))
            case None =>
              open = Some(OpenSession(1L, secs, secs, 1L))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last * 1000L + gapMs)
        }
        closed.result().iterator
      }
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
         st: GroupState[OpenSession]) =>
          fn(user, it.map(r => (r._2.getTime / 1000L, r._3)), st)
      }
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
