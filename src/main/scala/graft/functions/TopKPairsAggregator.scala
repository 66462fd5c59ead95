package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregate over (score, id) pairs: the k best rows per
  * group by (score desc, id asc) — the per-query cut of the
  * set-oriented retrieval path ([[graft.operators.Retrieval.
  * bm25TopKIndexedMany]]).
  *
  * Like [[TopKAggregator]], the buffer is a bounded sorted array
  * (size ≤ k), so partial aggregation is map-side and merge is O(k) —
  * a query with a million candidate docs still ships k (double, long)
  * pairs per partition, where a per-group sort window would shuffle
  * and sort every candidate. The id tiebreak makes the k-boundary cut
  * deterministic under equal scores regardless of partitioning and
  * merge order.
  */
class TopKPairsAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)],
      Array[(Double, Long)]] {
  require(k > 0)

  // best first: higher score wins, smaller id breaks ties
  private val ord: Ordering[(Double, Long)] =
    Ordering.by(t => (-t._1, t._2))

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)],
                      v: (Double, Long)): Array[(Double, Long)] =
    if (buf.length < k || ord.lt(v, buf.last)) {
      val merged = (buf :+ v).sorted(ord)
      if (merged.length > k) merged.take(k) else merged
    } else buf

  override def merge(a: Array[(Double, Long)],
                     b: Array[(Double, Long)]): Array[(Double, Long)] = {
    val merged = (a ++ b).sorted(ord)
    if (merged.length > k) merged.take(k) else merged
  }

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] =
    buf

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Array[(Double, Long)]]()
}
