package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of an `array<string>` token column in one map pass —
  * weighted bit voting over each token's xxhash64, no explode, no shuffle.
  *
  * Hash-compatible with the composable form (per token
  * `xxhash64(tok)` = `XXH64.hashUnsafeBytes(tok, seed=42)`, then per bit
  * vote +1/-1 on `(h >> i) & 1`, sig bit set when votes > 0). NULL when the
  * document has no tokens — empty docs must not all share one signature.
  */
object SimHash {
  /** Called from generated code. Returns boxed Long or null. */
  def signature(arr: ArrayData): java.lang.Long = {
    if (arr == null) return null
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        seen = true
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    if (!seen) return null
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }
}

case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sig"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = SimHash.signature(child.eval(input).asInstanceOf[ArrayData])
    if (v == null) null else v.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    ev.copy(code = code"""
      ${c.code}
      java.lang.Long $boxed = graft.functions.SimHash.signature(
        ${c.isNull} ? null : ${c.value});
      boolean ${ev.isNull} = ($boxed == null);
      long ${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}
