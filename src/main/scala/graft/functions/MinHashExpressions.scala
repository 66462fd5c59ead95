package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Oracle-reproducible hashing for near-dup operators.
  *
  * MinHash/SimHash built on engine hashes (xxhash64) can only be
  * rows-only checked — DuckDB cannot reproduce them. These variants key
  * every hash off the polynomial code-point fingerprint
  * `h = (h*31 + codepoint) mod 1e9+7` (same fold as
  * `TextAnalysis.fingerprint`, provably DuckDB-matching via
  * `list_reduce`) and derive k hash components with the arithmetic-only
  * family `h_i(x) = (a_i*x + b_i) mod (2^31-1)` — every step exact
  * BIGINT arithmetic both engines compute identically, so the driver's
  * DuckDB oracle hash-checks the full MinHash/LSH/SimHash pipeline.
  *
  * Both are single per-row calls (no explode, no shuffle): the whole
  * signature computation is a narrow map over document bytes.
  */
object PolyFp {
  /** Fingerprint modulus (1e9+7) — small enough that a_i*fp stays well
    * inside signed-64 range for both engines.
    */
  val Mod = 1000000007L
  /** MinHash component modulus, 2^31-1 (Mersenne prime). */
  val P = 2147483647L

  /** a_i in [1, P): (i+1)*15485863 — i <= 63 keeps it < P, and
    * a_i*(Mod-1) < 2^60, overflow-free in BIGINT on both engines.
    */
  def a(i: Int): Long = (i + 1) * 15485863L
  /** b_i in [0, P): i*32452843 + 11 (i <= 63 keeps it < P). */
  def b(i: Int): Long = i * 32452843L + 11L

  /** Fold `s`'s Unicode code points into a running fingerprint —
    * identical to DuckDB's
    * `list_reduce(list_prepend(h0, list_transform(string_split(s,''),
    *   c -> unicode(c))), (h,c) -> (h*31+c)%1000000007)`.
    * Decodes UTF-8 in place; no String allocation.
    */
  def mix(h0: Long, s: UTF8String): Long = {
    var h = h0
    var i = 0
    val n = s.numBytes
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xE0) == 0xC0) {
        cp = ((b0 & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F); len = 2
      } else if ((b0 & 0xF0) == 0xE0) {
        cp = ((b0 & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
          (s.getByte(i + 2) & 0x3F); len = 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
          ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F)
        len = 4
      }
      h = (h * 31 + cp) % Mod
      i += len
    }
    h
  }

  private[functions] val space = UTF8String.fromString(" ")
}

/** k-component MinHash signature over word n-gram shingles, one call per
  * row. Shingle fingerprints are accumulated straight off the token
  * bytes (joiner space mixed in between) — the shingle string itself is
  * never materialized. Returns NULL when the document has fewer than n
  * tokens (no shingles), matching the grouped formulation where such
  * docs produce no output row.
  */
case class MinHashSigExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1 && k >= 1 && k <= 64, "need 1 <= n, 1 <= k <= 64")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  private lazy val as: Array[Long] = Array.tabulate(k)(PolyFp.a)
  private lazy val bs: Array[Long] = Array.tabulate(k)(PolyFp.b)

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].split(PolyFp.space, -1)
    val count = toks.length - n + 1
    if (count <= 0) null
    else {
      val mins = Array.fill(k)(Long.MaxValue)
      var s = 0
      while (s < count) {
        var h = 0L
        var j = s
        while (j < s + n) {
          if (j > s) h = (h * 31 + 32) % PolyFp.Mod // ' ' joiner
          h = PolyFp.mix(h, toks(j))
          j += 1
        }
        var i = 0
        while (i < k) {
          val hv = (as(i) * h + bs(i)) % PolyFp.P
          if (hv < mins(i)) mins(i) = hv
          i += 1
        }
        s += 1
      }
      new GenericArrayData(mins)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** Rolling polynomial content fingerprint `(h*31+codepoint) mod 1e9+7`
  * as a single native call — identical semantics to the composable
  * `aggregate(transform(split(...)))` fold (and to DuckDB's
  * `list_reduce` over `unicode()` code points), without the interpreted
  * higher-order lambdas.
  */
case class PolyFingerprintExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fingerprint"

  override protected def nullSafeEval(v: Any): Any =
    PolyFp.mix(0L, v.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprintExpr =
    copy(child = newChild)
}

/** Per-row marker-word vote counts: for each marker set, how many
  * whitespace tokens of `child` are members. One tokenize pass per row
  * covering every set — replaces N interpreted `size(filter(toks,
  * isin(...)))` higher-order lambdas (language-ID, stopword ratios).
  * Sets are tiny (≤ a few words), so membership is a linear
  * UTF8String.equals scan — no boxing, no per-token allocation.
  */
case class MarkerVotesExpr(child: Expression, markers: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "marker_votes"

  @transient private lazy val sets: Array[Array[UTF8String]] =
    markers.map(_.map(UTF8String.fromString).toArray).toArray

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].split(PolyFp.space, -1)
    val counts = new Array[Long](sets.length)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      var s = 0
      while (s < sets.length) {
        val set = sets(s)
        var i = 0
        while (i < set.length) {
          if (set(i).equals(tok)) { counts(s) += 1; i = set.length }
          else i += 1
        }
        s += 1
      }
      t += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerVotesExpr =
    copy(child = newChild)
}

/** 64-bit SimHash over whitespace tokens using the PolyFp hash family:
  * token fingerprint x, bit j votes +1 when (a_j*x+b_j) mod P is odd
  * else −1; bit set when the vote sum is positive. Empty tokens (from
  * repeated spaces) are skipped. Oracle-reproducible, unlike the
  * xxhash64-keyed [[SimHash64Expr]] (still available for scale users who
  * prefer the stronger engine hash).
  */
case class SimHashFpExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_fp"

  private lazy val as: Array[Long] = Array.tabulate(64)(PolyFp.a)
  private lazy val bs: Array[Long] = Array.tabulate(64)(PolyFp.b)

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].split(PolyFp.space, -1)
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.numBytes() > 0) {
        val x = PolyFp.mix(0L, tok)
        var j = 0
        while (j < 64) {
          if (((as(j) * x + bs(j)) % PolyFp.P & 1L) == 1L) counts(j) += 1
          else counts(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var hash = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) hash |= (1L << j)
      j += 1
    }
    hash
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashFpExpr =
    copy(child = newChild)
}
