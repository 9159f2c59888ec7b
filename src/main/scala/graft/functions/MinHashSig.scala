package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Single-pass MinHash signature kernel: one string hash per shingle plus k
  * cheap int-mix hashes, running minima in a primitive array.
  *
  * Hash-compatible BY CONSTRUCTION with the composable form
  * `min(xxhash64(shingle, lit(seed)))` for seed in 0 until k: Spark's
  * xxhash64 chains arguments — the string hashed with seed 42, then the
  * int literal hashed with that result as seed — which is exactly
  * `XXH64.hashInt(seed, XXH64.hashUnsafeBytes(shingle, 42))`.
  */
object MinHash {
  val Sentinel: Long = Long.MaxValue // empty/null docs: no shingle set

  /** Called from generated code — keep the signature JVM-friendly. */
  def signature(arr: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Sentinel)
    if (arr != null) {
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
          var j = 0
          while (j < k) {
            val h2 = XXH64.hashInt(j, h1)
            if (h2 < out(j)) out(j) = h2
            j += 1
          }
        }
        i += 1
      }
    }
    // primitive-array path: GenericArrayData(Array[Long]) would box all k
    // longs per document — billions of allocations at corpus scale
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** The k-slot MinHash signature of an `array<string>` shingle column as ONE
  * narrow map-side expression — no explode, no shuffle, no aggregation.
  *
  * The composable alternative (explode + k min-aggregates) is already the
  * right SHAPE for Spark (map-side partial agg), but it still pays a
  * groupBy exchange and per-row explosion; at 100 TB the signature stage
  * becomes a pure map and the only dedup shuffle left is the band-bucket
  * join. NULL input yields the sentinel-filled signature (same as the
  * aggregate form's coalesce), so the expression itself is never null.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string> and k > 0, got ${child.dataType.catalogString}, k=$k")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    MinHash.signature(child.eval(input).asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.MinHash.signature(${c.isNull} ? null : ${c.value}, $k);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
