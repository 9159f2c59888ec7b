package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Argmin-by-squared-euclidean over a driver-resident centroid matrix, as
  * one native codegen kernel — the IVF list assignment.
  *
  * The expression-composed form (nLists × dim unrolled `get()`/arithmetic
  * terms inside `array_min` over structs) was correct and fast, but its
  * generated code — fused into the chunk-explode Generate stage, whose
  * consume method janino cannot split — tipped the stage over the 64 KB
  * method limit, forcing whole-stage interpreted fallback (logged
  * `ERROR CodeGenerator` on every run). This kernel is one call site and
  * one reference object. Semantics match the composed form exactly:
  * distances accumulate left-to-right per dimension, ties go to the LOWER
  * list index, NULL vector (or a dimension mismatch) yields NULL.
  */
object NearestCentroidKernel {
  /** Called from generated code — keep the signature JVM-friendly.
    * Returns -1 for a dimension mismatch (mapped to NULL by the caller).
    */
  def nearest(v: ArrayData, cents: Array[Array[Double]]): Int = {
    val dim = cents(0).length
    if (v.numElements() != dim) return -1
    var best = 0
    var bd = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var s = 0.0
      var j = 0
      while (j < dim) { val t = v.getDouble(j) - cent(j); s += t * t; j += 1 }
      if (s < bd) { bd = s; best = c }   // strict: ties keep the lower c
      c += 1
    }
    best
  }
}

case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if centroids.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<double> and a non-empty centroid " +
        s"set, got ${child.dataType.catalogString}, n=${centroids.length}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(input: Any): Any = {
    val r = NearestCentroidKernel.nearest(input.asInstanceOf[ArrayData],
      centroids)
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = graft.functions.NearestCentroidKernel.nearest($v, $cents);
         |if (${ev.value} < 0) ${ev.isNull} = true;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
