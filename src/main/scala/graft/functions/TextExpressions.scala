package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text hot path.
  *
  * The composable form (split → transform/slice/concat_ws lambdas, or
  * explode → groupBy with 64 bit-sum aggregates) is semantically fine but
  * evaluates higher-order lambdas INTERPRETED, allocating boxed values
  * per token — GC-heavy and 10-50× slower than a native loop. These
  * expressions keep identical semantics with one JVM call per row.
  */

/** Word n-gram shingles: equivalent to
  * `transform(sequence(0, size(toks)-n), i -> concat_ws(" ", slice(toks, i+1, n)))`
  * over `split(text, " ")` — byte-level operations on UTF8String, no
  * per-token boxing. Returns an empty array when the doc has < n tokens.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(v: Any): Any = {
    // split(-1): trailing empty tokens kept, matching Spark's split()
    val toks = v.asInstanceOf[UTF8String].split(space, -1)
    val count = toks.length - n + 1
    if (count <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = UTF8String.concatWs(space,
          java.util.Arrays.copyOfRange(toks, i, i + n): _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** Character trigrams: equivalent to
  * `transform(sequence(0, length(text)-3), i -> substr(text, i+1, 3))`
  * — overlapping char windows, multiplicity kept, empty for texts
  * shorter than 3 chars. One compiled loop per row instead of an
  * interpreted lambda per character position.
  */
case class CharTrigramsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_trigrams"

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val count = s.numChars() - 2
    if (count <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = s.substringSQL(i + 1, 3)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharTrigramsExpr =
    copy(child = newChild)
}

/** Hashing-trick linear text-classifier inference (the fasttext-style
  * quality-filter shape): every whitespace token hashes to a feature id
  * via the oracle-reproducible polynomial fingerprint
  * (`PolyFp.mix mod weights.length`), and the document score is the sum
  * of the hashed features' weights — integer arithmetic end to end, so
  * a DuckDB oracle reproduces scores bit-exactly. One pass over the
  * document bytes: token fingerprints fold inline (single-byte 0x20
  * never occurs inside a multi-byte UTF-8 sequence), no token array is
  * materialized. Empty tokens (split semantics: consecutive spaces)
  * hash like the empty string, matching the composable
  * split→transform→aggregate formulation element for element.
  *
  * The weight vector is the model: learned weights ship here as a
  * literal (serialized once per task). Null text scores null.
  */
case class LinearTextScoreExpr(child: Expression, weights: Array[Long])
    extends UnaryExpression with CodegenFallback {

  require(weights.nonEmpty, "weights must be non-empty")
  override def dataType: DataType = LongType
  override def prettyName: String = "linear_text_score"

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val dim = weights.length
    val n = s.numBytes
    var score = 0L
    var h = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      if (b0 == 0x20) {
        score += weights((h % dim).toInt)
        h = 0L
        i += 1
      } else {
        var cp = 0
        var len = 1
        // Continuation reads are clamped to numBytes: a truncated or
        // invalid multi-byte sequence at the end of the string must not
        // read past the buffer (unchecked unsafe access for off-heap
        // UTF8Strings). A lead byte short of continuation bytes — or an
        // invalid lead byte — scores as a single-byte codepoint.
        if (b0 < 0x80) cp = b0
        else if ((b0 & 0xE0) == 0xC0 && i + 1 < n) {
          cp = ((b0 & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F); len = 2
        } else if ((b0 & 0xF0) == 0xE0 && i + 2 < n) {
          cp = ((b0 & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
            (s.getByte(i + 2) & 0x3F); len = 3
        } else if ((b0 & 0xF8) == 0xF0 && i + 3 < n) {
          cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
            ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F)
          len = 4
        } else cp = b0
        h = (h * 31 + cp) % PolyFp.Mod
        i += len
      }
    }
    score += weights((h % dim).toInt)
    score
  }

  override protected def withNewChildInternal(newChild: Expression): LinearTextScoreExpr =
    copy(child = newChild)
}

/** Drop exact-match lines from a document in one compiled pass: split on
  * the LITERAL separator, drop every segment present in `drop` (hash-set
  * lookup), re-join survivors with the same separator. Returns null when
  * no line survives (caller filters — the doc was pure boilerplate).
  *
  * The drop set ships inside the expression (serialized once per task,
  * not per row) — the narrow arm of [[graft.operators.Curation.dropFrequentLines]],
  * used when the measured boilerplate set is small enough to inline.
  */
case class DropLinesExpr(child: Expression, sep: String, drop: Array[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "drop_lines"

  @transient private lazy val sepRaw = UTF8String.fromString(sep)
  @transient private lazy val sepPat =
    UTF8String.fromString(java.util.regex.Pattern.quote(sep))
  @transient private lazy val dropSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](drop.length * 2 + 1)
    drop.foreach(d => s.add(UTF8String.fromString(d)))
    s
  }

  override protected def nullSafeEval(v: Any): Any = {
    val parts = v.asInstanceOf[UTF8String].split(sepPat, -1)
    val kept = new java.util.ArrayList[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (!dropSet.contains(parts(i))) kept.add(parts(i))
      i += 1
    }
    if (kept.isEmpty) null
    else UTF8String.concatWs(sepRaw, kept.toArray(new Array[UTF8String](kept.size())): _*)
  }

  override protected def withNewChildInternal(newChild: Expression): DropLinesExpr =
    copy(child = newChild)
}

/** 64-bit SimHash over whitespace tokens, one call per row — replaces an
  * explode + 64-aggregate groupBy (i.e. removes a whole shuffle). Token
  * hash = XXH64(utf8 bytes, seed 42), identical to Spark's
  * `xxhash64(tok)`, so results match the composable formulation bit for
  * bit: per bit b, sum +1/−1 across tokens by bit value; sum > 0 → bit
  * set.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].split(space, -1)
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      val h = XXH64.hashUnsafeBytes(
        tok.getBaseObject, tok.getBaseOffset, tok.numBytes(), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      t += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) hash |= (1L << b)
      b += 1
    }
    hash
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Content-defined chunk windows for substring-level dedup: at every
  * char position whose `anchorLen`-char polynomial fingerprint
  * (`(h*31+cp) % 1e9+7`, the PolyFp/x_fingerprint hash) is ≡ 0 mod
  * `anchorMod`, emit the `window`-char substring starting there.
  * Anchor positions are a pure function of LOCAL content, so two
  * documents sharing any run of ≥ `window + anchorMod·anchorLen`-ish
  * chars emit at least one IDENTICAL window regardless of where the
  * run sits in each document — the alignment-free property fixed-stride
  * sampling lacks (a shared suffix at different offsets never lines up
  * with stride-k grid positions). Expected density: one window per
  * `anchorMod` positions.
  *
  * Oracle-reproducible in SQL:
  * `list_transform(list_filter(generate_series(1, len(text)-window+1),
  *    p -> poly(substr(text, p, anchorLen)) % anchorMod = 0),
  *  p -> substr(text, p, window))`.
  * One compiled pass per row: codepoints decode once, each anchor
  * probe re-mixes `anchorLen` codepoints (no rolling-hash shortcut, so
  * the SQL mirror stays trivially identical).
  */
private[functions] object CdcUtil {
  /** Decode `s`'s codepoints (the PolyFp.mix UTF-8 walk). Continuation
    * reads are clamped to numBytes: a truncated/invalid multi-byte
    * tail decodes as a single byte instead of reading past the buffer
    * (unsafe for off-heap strings — the LinearTextScoreExpr rule).
    * Returns (codepoints, count).
    */
  def decode(s: UTF8String): (Array[Long], Int) = {
    val nBytes = s.numBytes
    val cps = new Array[Long](math.max(nBytes, 1))
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xE0) == 0xC0 && i + 1 < nBytes) {
        cp = ((b0 & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F); len = 2
      } else if ((b0 & 0xF0) == 0xE0 && i + 2 < nBytes) {
        cp = ((b0 & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
          (s.getByte(i + 2) & 0x3F); len = 3
      } else if ((b0 & 0xF8) == 0xF0 && i + 3 < nBytes) {
        cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
          ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F)
        len = 4
      } else cp = b0
      cps(nChars) = cp.toLong
      nChars += 1
      i += len
    }
    (cps, nChars)
  }

  /** 1-based anchor positions: p where the `anchorLen`-codepoint
    * polynomial fingerprint at p is ≡ 0 mod `anchorMod`, for p ranging
    * over full-window starts only.
    */
  def anchors(cps: Array[Long], nChars: Int, window: Int,
              anchorLen: Int, anchorMod: Int): Array[Int] = {
    val count = nChars - window + 1
    if (count <= 0) return Array.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var p = 0
    while (p < count) {
      var h = 0L
      var j = 0
      while (j < anchorLen) {
        h = (h * 31L + cps(p + j)) % 1000000007L
        j += 1
      }
      if (h % anchorMod == 0L) out += p + 1
      p += 1
    }
    out.toArray
  }
}

case class CdcWindowsExpr(child: Expression, window: Int, anchorLen: Int,
                          anchorMod: Int)
    extends UnaryExpression with CodegenFallback {

  require(window >= 1, "window must be >= 1")
  require(anchorLen >= 1 && anchorLen <= window,
    "need 1 <= anchorLen <= window")
  require(anchorMod >= 1, "anchorMod must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_windows"

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val (cps, nChars) = CdcUtil.decode(s)
    val ps = CdcUtil.anchors(cps, nChars, window, anchorLen, anchorMod)
    new GenericArrayData(
      ps.map(p => s.substringSQL(p, window): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): CdcWindowsExpr =
    copy(child = newChild)
}

/** The 1-based anchor POSITIONS of [[CdcWindowsExpr]] (same predicate,
  * positions instead of window strings) — for span-level operations
  * that need to know WHERE a shared window sits (scrubbing, interval
  * accounting). `array_position`-compatible ints.
  */
case class CdcAnchorsExpr(child: Expression, window: Int, anchorLen: Int,
                          anchorMod: Int)
    extends UnaryExpression with CodegenFallback {

  require(window >= 1, "window must be >= 1")
  require(anchorLen >= 1 && anchorLen <= window,
    "need 1 <= anchorLen <= window")
  require(anchorMod >= 1, "anchorMod must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_anchors"

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val (cps, nChars) = CdcUtil.decode(s)
    new GenericArrayData(
      CdcUtil.anchors(cps, nChars, window, anchorLen, anchorMod)
        .map(p => p: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): CdcAnchorsExpr =
    copy(child = newChild)
}

/** Polynomial fingerprints of the content-defined windows of
  * [[CdcWindowsExpr]]: for each anchor position, the PolyFp hash
  * (`(h*31+cp) % 1e9+7`) of the full `window`-codepoint substring —
  * the persistable form of a window for incremental substring-dedup
  * stores. Unlike xxhash64, the fingerprint is ORACLE-COMPUTABLE
  * (DuckDB `list_reduce` over `unicode()`, the x_fingerprint idiom),
  * so a store gate matching on it is hash-checkable end to end.
  * Duplicate fingerprints within one document are kept (callers
  * distinct at the (id, fp) level).
  */
case class CdcFingerprintsExpr(child: Expression, window: Int,
                               anchorLen: Int, anchorMod: Int)
    extends UnaryExpression with CodegenFallback {

  require(window >= 1, "window must be >= 1")
  require(anchorLen >= 1 && anchorLen <= window,
    "need 1 <= anchorLen <= window")
  require(anchorMod >= 1, "anchorMod must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_fingerprints"

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val (cps, nChars) = CdcUtil.decode(s)
    val ps = CdcUtil.anchors(cps, nChars, window, anchorLen, anchorMod)
    val out = new Array[Any](ps.length)
    var i = 0
    while (i < ps.length) {
      val p0 = ps(i) - 1
      var h = 0L
      var j = 0
      while (j < window) {
        h = (h * 31L + cps(p0 + j)) % 1000000007L
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcFingerprintsExpr =
    copy(child = newChild)
}

/** Remove the union of `window`-char spans starting at the given
  * 1-based char positions from `text` — the rebuild step of substring
  * scrubbing. Overlapping/adjacent spans merge; positions need not be
  * sorted (sorted defensively — they arrive from collect_set). A fully
  * covered text returns the empty string.
  */
case class DropSpansExpr(left: Expression, right: Expression, window: Int)
    extends BinaryExpression with CodegenFallback {

  require(window >= 1, "window must be >= 1")
  override def dataType: DataType = StringType
  override def prettyName: String = "drop_spans"

  override protected def nullSafeEval(t: Any, arr: Any): Any = {
    val s = t.asInstanceOf[UTF8String]
    val ps = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().clone().sorted
    val n = s.numChars
    val segs = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var cur = 1
    var i = 0
    while (i < ps.length) {
      val start = ps(i)
      val end = start + window // exclusive
      if (start > cur) segs += s.substringSQL(cur, start - cur)
      if (end > cur) cur = end
      i += 1
    }
    if (cur <= n) segs += s.substringSQL(cur, n - cur + 1)
    if (segs.isEmpty) UTF8String.EMPTY_UTF8
    else UTF8String.concat(segs.toSeq: _*)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropSpansExpr =
    copy(left = newLeft, right = newRight)
}
