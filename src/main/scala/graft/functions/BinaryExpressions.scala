package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fixed-size chunking of a binary payload → array<binary> — the frame/
  * block primitive for multimodal columns (video frame extraction, audio
  * windows, image tiles all reduce to "split the blob, process chunks").
  * The last chunk may be short; empty payloads produce an empty array.
  */
case class BinaryChunksExpr(child: Expression, chunkSize: Int)
    extends UnaryExpression with CodegenFallback {

  require(chunkSize > 0, "chunkSize must be positive")
  override def dataType: DataType =
    ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "binary_chunks"

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val n = (bytes.length + chunkSize - 1) / chunkSize
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val from = i * chunkSize
      out(i) = java.util.Arrays.copyOfRange(bytes, from,
        math.min(from + chunkSize, bytes.length))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): BinaryChunksExpr =
    copy(child = newChild)
}
