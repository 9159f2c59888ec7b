package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All (i < j) index pairs of an `array<long>` id column as
  * `array<struct<id_a,id_b>>` — the in-bucket candidate-pair expansion of
  * the inverted-index dedup join, as one native pass.
  *
  * Replaces the nested `flatten(transform(ids, (a,i) =>
  * transform(slice(ids, i+2, n), b => struct(a, b))))`, which allocates an
  * interpreted lambda evaluation per ELEMENT PAIR (O(bucket²) — exactly
  * where the skew cap bounds work, every evaluation counts). Output order
  * matches the nested form: (i, j) ascending.
  */
object IdPairs {
  def pairs(arr: ArrayData): ArrayData = {
    if (arr == null) return null
    val n = arr.numElements()
    val out = new Array[AnyRef](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, arr.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class SortedIdPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sorted_id_pairs expects array<bigint>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "sorted_id_pairs"

  override protected def nullSafeEval(input: Any): Any =
    IdPairs.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IdPairs.pairs($c)")

  override protected def withNewChildInternal(newChild: Expression): SortedIdPairs =
    copy(child = newChild)
}
