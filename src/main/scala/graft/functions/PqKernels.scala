package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search" — public method), the compression rung below
  * int8 in the ANN family: a d-dim vector becomes m codebook ids (one byte
  * scale each at ksub ≤ 256), a d·4/m-fold scan-size reduction, scored
  * without decompression through a per-query lookup table (ADC).
  *
  * Both kernels carry their model as a BROADCAST (one copy per executor) and
  * run inside whole-stage codegen — the encode loop and the ADC probe are
  * tight primitive loops, no UDF boundary, no boxing.
  */

/** Encode an `array<double>` vector into `array<int>` PQ codes: for each of
  * the m subspaces, the index of the nearest (L2) sub-codeword.
  * `codebooks(i)(j)` is the j-th codeword of subspace i, laid out flat as
  * `Array[Double]` of length dsub.
  *
  * NULL for a NULL vector, for a length mismatch (size ≠ m·dsub), or when
  * any element is NULL — same strictness as the other array kernels.
  */
case class PqEncode(child: Expression,
                    codebooks: Broadcast[Array[Array[Array[Double]]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.resolved || child.dataType == ArrayType(DoubleType, true) ||
      child.dataType == ArrayType(DoubleType, false))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double>, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  @transient private lazy val cb = codebooks.value

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = cb.length
    val dsub = cb(0)(0).length
    if (v.numElements() != m * dsub) return null
    val out = new Array[Int](m)
    var i = 0
    while (i < m) {
      var best = 0
      var bestD = Double.MaxValue
      val words = cb(i)
      var j = 0
      while (j < words.length) {
        var d = 0.0
        val w = words(j)
        var t = 0
        while (t < dsub) {
          if (v.isNullAt(i * dsub + t)) return null
          val diff = v.getDouble(i * dsub + t) - w(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pqCbBc", codebooks,
      "org.apache.spark.broadcast.Broadcast")
    val cbCls = "double[][][]"
    val cbVar = ctx.addMutableState(cbCls, "pqCodebooks",
      v => s"$v = ($cbCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, vec => {
      val m = ctx.freshName("m"); val dsub = ctx.freshName("dsub")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val t = ctx.freshName("t")
      val d = ctx.freshName("d"); val bestD = ctx.freshName("bestD")
      val best = ctx.freshName("best"); val w = ctx.freshName("w")
      val diff = ctx.freshName("diff")
      s"""
         |final int $m = $cbVar.length;
         |final int $dsub = $cbVar[0][0].length;
         |if ($vec.numElements() != $m * $dsub) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $out = new int[$m];
         |  for (int $i = 0; $i < $m && !${ev.isNull}; $i++) {
         |    int $best = 0; double $bestD = Double.MAX_VALUE;
         |    for (int $j = 0; $j < $cbVar[$i].length; $j++) {
         |      double $d = 0.0; double[] $w = $cbVar[$i][$j];
         |      for (int $t = 0; $t < $dsub; $t++) {
         |        if ($vec.isNullAt($i * $dsub + $t)) { ${ev.isNull} = true; break; }
         |        double $diff = $vec.getDouble($i * $dsub + $t) - $w[$t];
         |        $d += $diff * $diff;
         |      }
         |      if (${ev.isNull}) break;
         |      if ($d < $bestD) { $bestD = $d; $best = $j; }
         |    }
         |    $out[$i] = $best;
         |  }
         |  if (!${ev.isNull})
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** ADC score of an `array<int>` PQ code against a per-query lookup table:
  * `Σ_i lut(i)(code(i))` — with an inner-product table over normalized
  * vectors this approximates the query·vector cosine without decompressing
  * anything. NULL for NULL code, length ≠ m, or out-of-range ids.
  */
case class PqAdcScore(child: Expression,
                      lut: Broadcast[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.resolved || child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score expects array<int>, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_score"

  @transient private lazy val table = lut.value

  override def nullSafeEval(input: Any): Any = {
    val code = input.asInstanceOf[ArrayData]
    val m = table.length
    if (code.numElements() != m) return null
    var s = 0.0
    var i = 0
    while (i < m) {
      if (code.isNullAt(i)) return null
      val j = code.getInt(i)
      if (j < 0 || j >= table(i).length) return null
      s += table(i)(j)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pqLutBc", lut,
      "org.apache.spark.broadcast.Broadcast")
    val lutCls = "double[][]"
    val lutVar = ctx.addMutableState(lutCls, "pqLut",
      v => s"$v = ($lutCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, code => {
      val m = ctx.freshName("m"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      s"""
         |final int $m = $lutVar.length;
         |if ($code.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($code.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    int $j = $code.getInt($i);
         |    if ($j < 0 || $j >= $lutVar[$i].length) { ${ev.isNull} = true; break; }
         |    $s += $lutVar[$i][$j];
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)
}

/** Decode an `array<int>` PQ code back to its reconstructed `array<double>`
  * vector: the concatenation of the m selected codewords. The codebooks ride
  * a BROADCAST (one copy per executor), so the model size never enters the
  * Catalyst plan — the literal-array reconstruction this replaces embedded
  * m·ksub·dsub `lit` nodes per query plan, which bloats analysis and risks
  * the 64 KB generated-method limit at realistic params (ksub = 256).
  * Element order matches per-subspace sequential layout, so a dot product
  * over the decoded array is bit-identical to the literal form's
  * `element_at`-concat reconstruction. NULL for NULL code, length ≠ m, or an
  * out-of-range id — same strictness as [[PqAdcScore]].
  */
case class PqDecode(child: Expression,
                    codebooks: Broadcast[Array[Array[Array[Double]]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.resolved || child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_decode expects array<int>, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_decode"

  @transient private lazy val cb = codebooks.value

  override def nullSafeEval(input: Any): Any = {
    val code = input.asInstanceOf[ArrayData]
    val m = cb.length
    val dsub = cb(0)(0).length
    if (code.numElements() != m) return null
    val out = new Array[Double](m * dsub)
    var i = 0
    while (i < m) {
      if (code.isNullAt(i)) return null
      val j = code.getInt(i)
      if (j < 0 || j >= cb(i).length) return null
      System.arraycopy(cb(i)(j), 0, out, i * dsub, dsub)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pqDecCbBc", codebooks,
      "org.apache.spark.broadcast.Broadcast")
    val cbCls = "double[][][]"
    val cbVar = ctx.addMutableState(cbCls, "pqDecCodebooks",
      v => s"$v = ($cbCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, code => {
      val m = ctx.freshName("m"); val dsub = ctx.freshName("dsub")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |final int $m = $cbVar.length;
         |final int $dsub = $cbVar[0][0].length;
         |if ($code.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$m * $dsub];
         |  for (int $i = 0; $i < $m && !${ev.isNull}; $i++) {
         |    if ($code.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    int $j = $code.getInt($i);
         |    if ($j < 0 || $j >= $cbVar[$i].length) { ${ev.isNull} = true; break; }
         |    System.arraycopy($cbVar[$i][$j], 0, $out, $i * $dsub, $dsub);
         |  }
         |  if (!${ev.isNull})
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqDecode =
    copy(child = newChild)
}
