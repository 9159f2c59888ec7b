package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of array<string> elements present in a fixed word set — the
  * stopword-profile scorer of language ID and quality signals, native.
  * `size(filter(tokens, w => w.isin(words)))` evaluates an interpreted
  * lambda per TOKEN per PROFILE (language ID runs four profiles over every
  * document); this is one hash probe per token. Count semantics are
  * identical: null elements are not members.
  */
case class StringInSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"string_in_set_count expects array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "string_in_set_count"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  private def count(arr: ArrayData): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("stringInSet", this,
      "graft.functions.StringInSetCount")
    defineCodeGen(ctx, ev, c => s"$selfRef.evalCount($c)")
  }

  /** Codegen entry point (the lazy set lives on this instance). */
  def evalCount(arr: ArrayData): Int = count(arr)

  override protected def withNewChildInternal(newChild: Expression): StringInSetCount =
    copy(child = newChild)
}

/** Count of characters inside the CJK unified range U+4E00..U+9FFF — the
  * zh-detection numerator of language ID, native. The composable form
  * (`size(filter(split(text, ""), c => c >= "一" && c <= "鿿"))`) splits the
  * document into one single-char UTF8String PER CHARACTER and compares each
  * interpreted; this walks the UTF-8 bytes once. Single-char binary order
  * equals code-point order, so counts are identical.
  */
case class CjkCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"cjk_count expects string, got ${dt.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "cjk_count"

  override protected def nullSafeEval(input: Any): Any =
    CjkCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CjkCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): CjkCount =
    copy(child = newChild)
}

object CjkCount {
  /** Called from generated code. Walks code points (surrogate-safe). */
  def count(s: UTF8String): Int = {
    val str = s.toString
    var c = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp >= 0x4e00 && cp <= 0x9fff) c += 1
      i += Character.charCount(cp)
    }
    c
  }
}

/** One-pass token length statistics of an array<string>:
  * `[sum(length(w)), sum(ceil(length(w)/4))]` — the mean-word-length
  * numerator and the BPE-ish subword-count estimate, native. The composable
  * forms were Catalyst `aggregate(...)` folds, which have no doGenCode and
  * run interpreted with a boxed accumulator per element (the last two such
  * HOFs on the quality path).
  *
  * Bit-compatible by construction: Spark `length` on strings is
  * `UTF8String.numChars`; `ceil(len/4.0).cast(long)` equals `(len+3)/4` in
  * exact integer arithmetic for any machine-int length; and a NULL element
  * nulls the whole result, exactly like `acc + NULL` poisoning the fold.
  */
case class TokenLenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"token_len_stats expects array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_len_stats"

  override protected def nullSafeEval(input: Any): Any =
    TokenLenStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TokenLenStats.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): TokenLenStats =
    copy(child = newChild)
}

object TokenLenStats {
  /** Called from generated code; null on a null element (HOF-fold parity). */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var sumLen = 0L
    var sumCeil4 = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val len = arr.getUTF8String(i).numChars().toLong
      sumLen += len
      sumCeil4 += (len + 3) / 4
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(sumLen, sumCeil4))
  }
}
