package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed min-k-distinct aggregate: the k smallest DISTINCT long values
  * per group, sorted ascending — the bounded-state primitive behind the
  * KMV distinct/overlap sketch ([[graft.operators.Overlap]]).
  *
  * The buffer is a sorted distinct array (size ≤ k): partial
  * aggregation is map-side and merge is O(k), so a group with a
  * billion rows ships k longs per partition — no per-group distinct
  * shuffle, no unbounded collect_set state. Output is deterministic
  * regardless of partitioning/merge order (duplicates are dropped, the
  * order is the value order).
  */
class MinKAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0)

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    if (buf.length >= k && v >= buf.last) buf
    else if (java.util.Arrays.binarySearch(buf, v) >= 0) buf
    else {
      val merged = (buf :+ v).sorted
      if (merged.length > k) merged.take(k) else merged
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val merged = (a ++ b).distinct.sorted
    if (merged.length > k) merged.take(k) else merged
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
