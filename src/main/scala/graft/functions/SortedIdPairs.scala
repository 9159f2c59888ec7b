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
    // Long math: n(n-1)/2 overflows Int past ~46k ids, which would wrap to a
    // negative (or worse, small positive) array size. A bucket that large
    // means the caller's skew cap is off — fail with the real story.
    val count = n.toLong * (n - 1) / 2
    require(count <= Int.MaxValue - 8,
      s"id-pair expansion of a $n-element bucket would produce $count pairs; " +
        "cap bucket sizes (maxDocFreq) before expanding")
    val out = new Array[AnyRef](count.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      // null ids cannot form real pairs; getLong would silently read 0 and
      // fabricate (0, x) candidates — loud beats corrupt
      require(!arr.isNullAt(i), s"sorted_id_pairs: null id at position $i")
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
