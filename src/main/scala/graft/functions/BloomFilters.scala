package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Shared bit arithmetic for the per-file bloom manifest
  * ([[graft.operators.Stats.writeKeyBloomManifest]]): build and probe
  * derive the k bit positions from ONE 64-bit key hash (Spark's
  * `xxhash64`, computed identically on both sides) via the
  * Kirsch–Mitzenmacher double-hashing scheme — g_i = h_hi + i·h_lo
  * (mod m) — so membership is deterministic given (hash, m, k) and no
  * second hash function ever needs to agree across build and probe.
  * `m` is a power of two; positions reduce by mask, never `%`.
  */
object BloomFilters {

  /** Smallest power of two ≥ `need`, floored at 64 bits and capped at
    * 2^28 (a 32 MiB blob — past that, cluster the layout instead).
    */
  def sizeBits(need: Long): Int = {
    val floored = math.max(64L, math.min(need, 1L << 28))
    var m = 64L
    while (m < floored) m <<= 1
    m.toInt
  }

  def setBits(bloom: Array[Byte], mBits: Int, k: Int, h: Long): Unit = {
    val mask = (mBits - 1).toLong
    val h1 = (h >>> 32).toInt
    val h2 = h.toInt
    var i = 0
    while (i < k) {
      val pos = ((h1.toLong + i.toLong * h2.toLong) & mask).toInt
      bloom(pos >>> 3) = (bloom(pos >>> 3) | (1 << (pos & 7))).toByte
      i += 1
    }
  }

  def mightContain(bloom: Array[Byte], mBits: Int, k: Int,
                   h: Long): Boolean = {
    val mask = (mBits - 1).toLong
    val h1 = (h >>> 32).toInt
    val h2 = h.toInt
    var i = 0
    while (i < k) {
      val pos = ((h1.toLong + i.toLong * h2.toLong) & mask).toInt
      if ((bloom(pos >>> 3) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** Per-group bloom build over pre-hashed keys — the aggregate of one
  * manifest-maintenance scan (`groupBy(file)`). Registered through
  * `functions.udaf`, it runs as a `TypedImperativeAggregate`: the blob
  * lives as ONE mutable JVM array per group per partition, mutated in
  * place per row and serialized only at the partial-aggregate
  * boundary — never per-row. Merge is a byte-wise OR, so partial
  * aggregation is map-side and order-independent: the blob is a pure
  * set union, bit-identical under any partitioning.
  */
class BloomAggregator(mBits: Int, k: Int)
    extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(mBits >= 64 && Integer.bitCount(mBits) == 1,
    s"mBits must be a power of two >= 64, got $mBits")
  require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")

  // empty sentinel: groups allocate on first reduce, so the encoder
  // never ships mBits/8 zero bytes for untouched partials
  override def zero: Array[Byte] = Array.empty

  override def reduce(buf: Array[Byte], h: Long): Array[Byte] = {
    val b = if (buf.length == 0) new Array[Byte](mBits >>> 3) else buf
    BloomFilters.setBits(b, mBits, k, h)
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.length == 0) b
    else if (b.length == 0) a
    else {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }

  override def finish(buf: Array[Byte]): Array[Byte] =
    if (buf.length == 0) new Array[Byte](mBits >>> 3) else buf

  override def bufferEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}
