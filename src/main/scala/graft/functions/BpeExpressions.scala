package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for BPE tokenizer training / application
  * (byte-pair encoding over word-internal character symbols — the
  * tokenizer-training pass a training-data pipeline runs over its own
  * corpus; cf. Sennrich et al. 2016 and the reference's tokenizer-side
  * text handling, `local_data_pipeline` models/staging text columns).
  *
  * Merge semantics (shared by both expressions and by the DuckDB
  * oracle): ONE merge (l, r) is a single left-to-right, non-overlapping
  * pass over the symbol sequence replacing each adjacent (l, r) with
  * the concatenation l+r — a match consumes both symbols, and scanning
  * resumes AFTER the merged token (so `a a a` under merge (a,a) yields
  * `aa a`, never `a aa` or `aaa`). This is exactly the semantics of a
  * literal global string `replace()` over a boundary-marked rendering
  * of the sequence, which is how the oracle reproduces it in SQL.
  */
private[graft] object BpeUtil {
  /** One left-to-right non-overlapping merge pass. */
  def mergeOnce(syms: Array[UTF8String], l: UTF8String,
                r: UTF8String): Array[UTF8String] = {
    val n = syms.length
    if (n < 2) return syms
    val out = new Array[UTF8String](n)
    var i = 0
    var o = 0
    while (i < n) {
      if (i < n - 1 && syms(i).equals(l) && syms(i + 1).equals(r)) {
        out(o) = UTF8String.concat(l, r)
        i += 2
      } else {
        out(o) = syms(i)
        i += 1
      }
      o += 1
    }
    if (o == n) syms else java.util.Arrays.copyOfRange(out, 0, o)
  }

  /** Split a word into per-code-point symbols (matching DuckDB's
    * `string_split(word, '')` and Spark's code-point `split`), decoding
    * UTF-8 in place.
    */
  def codePoints(s: UTF8String): Array[UTF8String] = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    if (nBytes == 0) return Array.empty
    var count = 0
    var i = 0
    while (i < nBytes) {
      // clamp a truncated/invalid multi-byte tail to the buffer end
      // (the LinearTextScoreExpr rule: never read past numBytes)
      i += math.max(1,
        math.min(UTF8String.numBytesForFirstByte(bytes(i)), nBytes - i))
      count += 1
    }
    val out = new Array[UTF8String](count)
    i = 0
    var o = 0
    while (i < nBytes) {
      val len = math.max(1,
        math.min(UTF8String.numBytesForFirstByte(bytes(i)), nBytes - i))
      out(o) = UTF8String.fromBytes(bytes, i, len)
      i += len
      o += 1
    }
    out
  }
}

/** Apply one BPE merge (l, r) to an `array<string>` symbol column —
  * the per-iteration step of [[graft.operators.Tokenizer.bpeTrain]]'s
  * vocabulary update. Narrow, no allocation beyond the output array.
  */
case class BpeMergeStepExpr(child: Expression, left: String, right: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge_step"

  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val syms = new Array[UTF8String](n)
    var i = 0
    while (i < n) { syms(i) = arr.getUTF8String(i); i += 1 }
    new GenericArrayData(
      BpeUtil.mergeOnce(syms, l, r).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeStepExpr =
    copy(child = newChild)
}

/** Tokenize a word string with a learned merge list: split into
  * code-point symbols, then apply each merge in learned order (one
  * left-to-right pass per merge). With an empty merge list this is the
  * code-point split itself. ONE JVM call per word — the whole learned
  * tokenizer rides the scan as a narrow map, no join against a vocab
  * table and no lambda boxing.
  */
case class BpeTokenizeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokenize"

  @transient private lazy val ms: Array[(UTF8String, UTF8String)] =
    merges.map { case (a, b) =>
      (UTF8String.fromString(a), UTF8String.fromString(b))
    }.toArray

  override protected def nullSafeEval(v: Any): Any = {
    var syms = BpeUtil.codePoints(v.asInstanceOf[UTF8String])
    var i = 0
    while (i < ms.length) {
      syms = BpeUtil.mergeOnce(syms, ms(i)._1, ms(i)._2)
      i += 1
    }
    new GenericArrayData(syms.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenizeExpr =
    copy(child = newChild)
}
