package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two `array<double>` columns as a native codegen
  * expression.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * is a higher-order function: Catalyst evaluates HOF lambdas INTERPRETED
  * (no doGenCode), allocates a zipped intermediate array per row, and boxes
  * every element. On the embedding-heavy paths (ANN scoring, cosine dedup
  * verify) the dot product runs once per candidate PAIR, so it dominates;
  * this expression is a tight primitive loop inside whole-stage codegen.
  *
  * Null semantics match the HOF formulation exactly: NULL when either array
  * is NULL, when lengths differ (zip_with pads the shorter side with nulls),
  * or when any element is NULL — summation is sequential left-to-right, so
  * results are bit-identical to the interpreted form.
  */
case class DoubleArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.resolved || !right.resolved ||
      (isDoubleArray(left.dataType) && isDoubleArray(right.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"array_dot expects (array<double>, array<double>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DoubleArrayDot =
    copy(left = newLeft, right = newRight)
}
