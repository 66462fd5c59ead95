package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregate: the k largest values per group, sorted
  * descending — the `Aggregator` (UDAF) surface of the engine.
  *
  * The buffer is a bounded sorted array (size ≤ k), so partial
  * aggregation is map-side and merge is O(k) — a group with a billion
  * rows still ships k doubles per partition. Output is deterministic
  * regardless of partitioning/merge order (duplicates compare equal).
  */
class TopKAggregator(k: Int) extends Aggregator[Double, Array[Double], Array[Double]] {
  require(k > 0)

  override def zero: Array[Double] = Array.empty

  private def insert(buf: Array[Double], v: Double): Array[Double] =
    if (buf.length < k || v > buf.last) {
      val merged = (buf :+ v).sorted(Ordering[Double].reverse)
      if (merged.length > k) merged.take(k) else merged
    } else buf

  override def reduce(buf: Array[Double], v: Double): Array[Double] =
    insert(buf, v)

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val merged = (a ++ b).sorted(Ordering[Double].reverse)
    if (merged.length > k) merged.take(k) else merged
  }

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
