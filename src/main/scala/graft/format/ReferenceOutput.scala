package graft.format

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** P4 + O1 + S2 — the reference's text output layout.
  *
  * Line format (`DocumentSimilarityReducer.java:105-107` + Hadoop
  * `TextOutputFormat`): `"<a>, <b>\tSimilarity: <%.2f>"`, globally sorted
  * byte-lexicographically by the pair key (single-reducer artifact the
  * golden files depend on).
  *
  * `format_string` delegates to `java.util.Formatter` — the same HALF_UP
  * `%.2f` rounding as the reference's `String.format`. (`format_number`
  * would be wrong: DecimalFormat rounds HALF_EVEN.)
  */
object ReferenceOutput {

  /** similarities(docA, docB, similarity, ...) → single-column lines. */
  def formatLines(sims: DataFrame): DataFrame =
    sims.select(
      format_string("%s, %s\tSimilarity: %.2f",
        col("docA"), col("docB"), col("similarity")).as("value"))

  /** The reference's single reducer sorts its input key, the CONCATENATED
    * `"docA,docB"` Text (`DocumentSimilarityReducer.java:45`), not the two
    * ids as separate fields — the orders diverge when one docId is a
    * proper prefix of another whose next byte sorts below ','.
    */
  private def pairKey = concat(col("docA"), lit(","), col("docB"))

  /** Globally sorted lines, as a driver-side array (tests / small outputs). */
  def collectSorted(sims: DataFrame): Array[String] =
    formatLines(sims.orderBy(pairKey))
      .collect().map(_.getString(0))

  /** Write the golden-file layout: sorted, one part file like the
    * reference's single reducer. The `coalesce(1)` exists only to mirror
    * the golden layout — large-scale runs should write partitioned output
    * (omit `singleFile`).
    */
  def write(sims: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val sorted = formatLines(sims.orderBy(pairKey))
    val out = if (singleFile) sorted.coalesce(1) else sorted
    out.write.mode("overwrite").text(path)
  }
}
