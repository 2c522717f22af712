package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

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
