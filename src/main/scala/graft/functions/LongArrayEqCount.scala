package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Count of positions where two `array<long>` columns agree — the MinHash
  * signature-agreement estimator, as a native codegen loop.
  *
  * Replaces `aggregate(zip_with(a, b, (x,y) => if(x===y) 1 else 0), 0, _+_)`
  * which runs interpreted per CANDIDATE PAIR in the LSH join (the hot spot of
  * minhashPairs). Semantics match that HOF form exactly: NULL only when
  * either ARRAY is null; mismatched lengths count agreements over the
  * overlap (zip_with pads the shorter side with nulls, and null === x
  * resolves to a 0 contribution); null elements count as non-matches (the
  * signatures here are containsNull=false anyway).
  */
case class LongArrayEqCount(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.resolved || !right.resolved || (ok(left.dataType) && ok(right.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_eq_count expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "array_eq_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) && $a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): LongArrayEqCount =
    copy(left = newLeft, right = newRight)
}
