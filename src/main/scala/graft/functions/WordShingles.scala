package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word-level n-gram shingles of an `array<string>` token column as one
  * native pass: n tokens joined by a single space per window.
  *
  * The composable zip-of-shifted-slices form (TextFunctions.shingles) was
  * already the right O(tokens) SHAPE, but arrays_zip + transform + concat_ws
  * run interpreted and allocate a zipped struct array per row; both dedup
  * families (MinHash, n-gram Jaccard) pay it on every document. Join
  * semantics match concat_ws(" ", ...): null tokens are SKIPPED, not
  * rendered (tokens() never yields nulls, but foreign callers might).
  */
object Shingles {
  private val Space = UTF8String.fromString(" ")

  /** Called from generated code. */
  def shingle(arr: ArrayData, n: Int): ArrayData = {
    if (arr == null) return null
    val len = arr.numElements()
    val out = math.max(len - n + 1, 0)
    val res = new Array[AnyRef](out)
    var i = 0
    while (i < out) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        // concat_ws semantics: null elements are skipped (concatWs ignores
        // null inputs), matching the HOF formulation exactly
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      res(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(res)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string> and n > 0, got ${dt.catalogString}, n=$n")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    Shingles.shingle(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.shingle($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
