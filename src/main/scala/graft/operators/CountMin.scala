package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Count-min sketch over a token stream: `depth` independent hash rows ×
  * `width` buckets, each cell the count of occurrences hashing into it.
  * Point estimate for a token = min over rows of its cell (always ≥ the
  * true count; collisions only inflate). The classic bounded-memory
  * heavy-hitter / frequency structure for a corpus too large to count
  * exactly.
  *
  * Scale shape: the sketch IS an aggregation — explode each occurrence
  * into `depth` (row, bucket) cells and count. Map-side combine collapses
  * every partition to ≤ depth×width rows before the shuffle, so the
  * exchange carries O(partitions × depth × width) rows regardless of
  * corpus size, and the final sketch (depth×width rows, e.g. 4×64) is
  * broadcastable. Sketches MERGE by summing cells — per-shard/per-day
  * register frames union+re-aggregate into a corpus-wide sketch without
  * touching the data again, exactly like [[Hll.registers]].
  *
  * Hashing is the portable 60-bit md5 scheme ([[HashFunctions.md5Long]]
  * of `"<row>:<token>"`, reduced mod `width`) so the DuckDB oracle
  * re-derives cells exactly; rows are independent because the row index
  * is baked into the hashed string.
  */
object CountMin {

  private def cellBucket(tokenCol: Column, row: Int, width: Int): Column =
    pmod(HashFunctions.md5Long(concat(lit(s"$row:"), tokenCol)), lit(width.toLong))

  /** Sketch cells (row, bucket, cnt) from exploded (…, token) postings —
    * one count per OCCURRENCE (multiset semantics, unlike the distinct
    * sets HLL sketches). Cells never hit by any token are absent (zero).
    */
  def registers(postings: DataFrame, tokenCol: String,
                depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch shape: $depth x $width")
    val cells = array((0 until depth).map { r =>
      struct(lit(r.toLong).as("row"), cellBucket(col(tokenCol), r, width).as("bucket"))
    }: _*)
    postings
      .filter(col(tokenCol).isNotNull)
      .select(explode(cells).as("__cell"))
      .groupBy(col("__cell.row").as("row"), col("__cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `items` tokens against a register frame: min over
    * the `depth` rows of each token's cell. The register frame is tiny
    * (≤ depth×width rows) and is broadcast — estimating any number of
    * tokens never reshuffles the sketch. Tokens whose cell is absent from
    * the frame never occurred: estimate 0.
    */
  def estimate(registers: DataFrame, items: DataFrame, tokenCol: String,
               depth: Int = 4, width: Int = 64): DataFrame = {
    val cells = array((0 until depth).map { r =>
      struct(lit(r.toLong).as("row"), cellBucket(col(tokenCol), r, width).as("bucket"))
    }: _*)
    items
      .select(col(tokenCol), explode(cells).as("__cell"))
      .select(col(tokenCol), col("__cell.row").as("row"),
        col("__cell.bucket").as("bucket"))
      .join(broadcast(registers), Seq("row", "bucket"), "left")
      .groupBy(col(tokenCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
