package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** N-gram shingles of an `array<string>` column as one native pass: n
  * elements joined by `sep` per window — " " for word shingles, "" for
  * character n-grams (both text-analysis families share this windowing).
  *
  * The composable zip-of-shifted-slices form (TextFunctions.shingles) was
  * already the right O(tokens) SHAPE, but arrays_zip + transform + concat_ws
  * run interpreted and allocate a zipped struct array per row; both dedup
  * families (MinHash, n-gram Jaccard) pay it on every document. Join
  * semantics match concat_ws(sep, ...): null elements are SKIPPED, not
  * rendered (tokens() never yields nulls, but foreign callers might).
  */
object Shingles {
  /** Called from generated code. `sep` arrives pre-encoded. */
  def shingle(arr: ArrayData, n: Int, sep: UTF8String): ArrayData = {
    if (arr == null) return null
    val len = arr.numElements()
    val out = math.max(len - n + 1, 0)
    val res = new Array[AnyRef](out)
    // one scratch window per DOCUMENT, overwritten per shingle — concatWs
    // copies bytes out, so reuse is safe, and per-window allocation would
    // recreate the GC pressure this kernel removes
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < out) {
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      res(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(res)
  }
}

case class WordShingles(child: Expression, n: Int, sep: String = " ")
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string> and n > 0, got ${dt.catalogString}, n=$n")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  @transient private lazy val sepUtf8 = UTF8String.fromString(sep)

  override protected def nullSafeEval(input: Any): Any =
    Shingles.shingle(input.asInstanceOf[ArrayData], n, sepUtf8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("shingleSep", sepUtf8,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.shingle($c, $n, $sepRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
