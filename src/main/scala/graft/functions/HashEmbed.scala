package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The deterministic hash embedding as one native codegen kernel.
  *
  * Bit-compatible BY CONSTRUCTION with the composable form per dimension i:
  * `conv(substring(md5(concat(text, ':salt:i')), 1, 4), 16, 10) % 1000` —
  * the first 4 hex chars of an md5 are its first 2 bytes big-endian, so the
  * kernel digests the UTF-8 bytes directly and folds
  * `((b0 & 0xFF) << 8 | (b1 & 0xFF)) % 1000` without materializing hex
  * strings. The composed form expanded to ~dim×4 Catalyst string expressions
  * per consumer; inlined into the retrieval probe stage it overflowed the
  * 64 KB generated-method limit (whole-stage fallback) — this kernel is one
  * call site and one digest per dimension.
  */
object HashEmbedKernel {
  /** Called from generated code — keep the signature JVM-friendly. */
  def embed(text: UTF8String, dim: Int, saltedSuffixes: Array[Array[Byte]]): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](dim)
    val body = text.getBytes
    var i = 0
    while (i < dim) {
      md.reset()
      md.update(body)
      md.update(saltedSuffixes(i))
      val d = md.digest()
      out(i) = (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % 1000L
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def suffixes(dim: Int, salt: String): Array[Array[Byte]] =
    Array.tabulate(dim)(i =>
      s":$salt:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

case class HashEmbed(child: Expression, dim: Int, salt: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if dim >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"hash_embed expects a string column and dim >= 1, got " +
        s"${child.dataType.catalogString}, dim=$dim")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hash_embed"

  @transient private lazy val suffixes = HashEmbedKernel.suffixes(dim, salt)

  override def nullSafeEval(input: Any): Any =
    HashEmbedKernel.embed(input.asInstanceOf[UTF8String], dim, suffixes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sufs = ctx.addReferenceObj("saltedSuffixes", suffixes,
      "byte[][]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.HashEmbedKernel.embed($t, $dim, $sufs);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}
