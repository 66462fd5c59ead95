package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Probe a serialized Count-Min sketch (the binary produced by Spark's
  * `count_min_sketch` aggregate) for the estimated count of `child` —
  * the missing read half of the built-in: Spark ships the mergeable
  * sketch aggregate but no SQL-level `estimateCount`.
  *
  * Hashing mirrors CountMinSketchAgg's update exactly (strings are
  * added as their UTF-8 bytes, integral types as longs), so the
  * structural CMS guarantee holds end to end: estimate ≥ true count
  * ALWAYS (deterministic — the basis of the x_cms_err gate), and
  * estimate ≤ true + eps·N with probability ≥ confidence.
  *
  * The sketch is a constructor argument (typically a few KB, captured
  * from a driver-side aggregate), deserialized once per task.
  */
case class CmsProbeExpr(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val sketch =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(sketchBytes)

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType | ShortType | ByteType |
          BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"cms_estimate: unsupported type $t")
    }

  override protected def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => sketch.estimateCount(s.getBytes)
    case b: Array[Byte] => sketch.estimateCount(b)
    case l: Long => sketch.estimateCount(l)
    case i: Int => sketch.estimateCount(i.toLong)
    case s: Short => sketch.estimateCount(s.toLong)
    case b: Byte => sketch.estimateCount(b.toLong)
    case other => sketch.estimateCount(other)
  }

  override protected def withNewChildInternal(newChild: Expression): CmsProbeExpr =
    copy(child = newChild)
}

/** Membership probe of a serialized Bloom filter (the binary produced
  * by `DataFrameStatFunctions.bloomFilter`) — the read half of Spark's
  * public sketch builder, as a plan-literal predicate.
  *
  * This is the runtime-filter primitive: build the filter over a join's
  * SMALL side (one distributed pass, O(filter bits) driver traffic via
  * treeAggregate — never the rows), then probe the BIG side map-side,
  * before its shuffle. The Bloom guarantee is one-sided: a true member
  * NEVER probes false (no false negatives), so pre-filtering a join
  * input with this predicate drops only rows that cannot match; an
  * exact join/anti-join over the survivors removes the ≤ fpp false
  * positives. See graft.operators.RuntimeFilter.
  *
  * Hashing mirrors BloomFilter.put's runtime dispatch exactly: strings
  * are probed as their UTF-8 bytes (putString hashes the same bytes),
  * integral types as longs, binary as-is — so probe(x) ⊇ put(x) holds
  * for every supported key type.
  */
case class BloomProbeExpr(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType | ShortType | ByteType |
          BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"bloom_might_contain: unsupported type $t")
    }

  override protected def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => bloom.mightContainBinary(s.getBytes)
    case b: Array[Byte] => bloom.mightContainBinary(b)
    case l: Long => bloom.mightContainLong(l)
    case i: Int => bloom.mightContainLong(i.toLong)
    case s: Short => bloom.mightContainLong(s.toLong)
    case b: Byte => bloom.mightContainLong(b.toLong)
    case other => bloom.mightContain(other)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbeExpr =
    copy(child = newChild)
}
