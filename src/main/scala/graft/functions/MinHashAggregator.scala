package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator: the UDAF form of the sketch, for
  * inputs that arrive EXPLODED as (docId, tokenHash) postings rather than
  * as a per-row token array (at 100 TB a document's tokens may never sit
  * in one row — e.g. straight off an inverted-index shuffle).
  *
  * Why an Aggregator and not collect_list + array math: the buffer is k
  * longs — CONSTANT regardless of document size — and Spark runs partial
  * aggregation map-side, so the shuffle carries one k-long sketch per
  * (partition, doc) instead of every posting. `merge` is elementwise min
  * (associative + commutative), which is what makes the sketch
  * combiner-safe.
  *
  * Input contract: token hashes already reduced mod
  * `HashFunctions.MinHashPrime` (`HashFunctions.tokenHashes` /
  * `md5Long(t) % P`). Produces exactly the same signatures as the
  * array-based `minHashSignatureFromHashes`.
  */
class MinHashAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  private val P = HashFunctions.MinHashPrime
  private val as = Array.tabulate(k)(HashFunctions.minHashA)
  private val bs = Array.tabulate(k)(HashFunctions.minHashB)

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < k) {
      val v = (as(j) * h + bs(j)) % P
      if (v < buf(j)) buf(j) = v
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
