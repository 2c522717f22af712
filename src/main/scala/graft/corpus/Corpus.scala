package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A parsed document: id + raw body text. */
case class Doc(docId: String, text: String)

/** S1 + F1 + F2 + P1 — corpus source.
  *
  * Input is the reference's line format: `<docId> <token token ...>` with
  * docId = substring before the first space of the trimmed line
  * (`DocumentSimilarityMapper.java:18-25`). Malformed lines (empty after
  * trim, or no space / leading-space ⇒ `indexOf(' ') <= 0`) are dropped,
  * expressed as ordinary Catalyst filters so they stay pushdown-able and
  * inside whole-stage codegen.
  */
object Corpus {

  /** Read a text corpus into `(docId: String, text: String)`. */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))

  /** Parse a one-column (`value: String`) DataFrame of raw lines. */
  def parse(lines: DataFrame): DataFrame = {
    // trim first (F1), then split on the FIRST space only (P1). After the
    // trim a leading space is impossible, so `size(parts)==2` is exactly
    // the reference's `firstSpace > 0` check (F2).
    lines
      .select(trim(col("value")).as("line"))
      .filter(length(col("line")) > 0)
      .select(split(col("line"), " ", 2).as("parts"))
      .filter(size(col("parts")) === 2)
      .select(
        trim(element_at(col("parts"), 1)).as("docId"),
        element_at(col("parts"), 2).as("text"))
  }
}
