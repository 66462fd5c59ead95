package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All unordered pairs (i < j) of an array's elements, as
  * array<struct<a: T, b: T>> — the in-bucket pair expansion for LSH /
  * shingle candidate generation. Equivalent to the nested
  * `transform(sequence(...), i -> transform(slice(...), ...))` lambda
  * pyramid, but one native call per row instead of O(k²) interpreted
  * closure invocations.
  */
case class PairCombinationsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", elemType), StructField("b", elemType))),
    containsNull = false)

  override def prettyName: String = "pair_combinations"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var idx = 0
    var i = 0
    while (i < n) {
      val a = arr.get(i, elemType)
      var j = i + 1
      while (j < n) {
        out(idx) = InternalRow(a, arr.get(j, elemType))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombinationsExpr =
    copy(child = newChild)
}
