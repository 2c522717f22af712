package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k `(value, id)` aggregator — the combiner formulation of
  * per-key top-k. The window formulation (`row_number` over a key
  * partition, filter rank <= k) shuffles EVERY row of every key just to
  * discard all but k of them; this buffer holds at most k entries, Spark
  * runs it map-side as a partial aggregate, and the shuffle carries one
  * <=k-entry buffer per (partition, key) — at corpus scale the difference
  * between shuffling the table and shuffling k rows per key per
  * partition.
  *
  * Ordering: value DESC, ties broken by id ASC, so the result is a
  * deterministic pure function of the input SET (partitioning- and
  * arrival-order-invariant). `merge` is a k-bounded merge of two sorted
  * buffers (associative + commutative), which is what makes the
  * aggregator combiner-safe.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)],
                       Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  // strict total order: value desc, then id asc. Double.compare (not
  // raw >) so the order stays total under NaN/-0.0 — an inconsistent
  // comparator makes sortWith throw, and a non-total order would make
  // the result depend on arrival order. NaN compares above +Inf.
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  // buffer invariant: sorted best-first, size <= k
  override def reduce(buf: Seq[(Double, Long)],
                      x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && !beats(x, buf.last)) buf // common case: no sort
    else ((buf :+ x).sortWith(beats)).take(k)

  override def merge(a: Seq[(Double, Long)],
                     b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(beats).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
