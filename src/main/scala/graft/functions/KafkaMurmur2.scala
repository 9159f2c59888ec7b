package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Kafka's murmur2 (seed 0x9747b28c) as a native Catalyst expression with
  * codegen — stays inside whole-stage codegen, unlike a Scala UDF (no
  * serialization boundary, no null-boxing per row). The generated code calls
  * the static forwarder of [[KHash.murmur2]].
  */
case class KafkaMurmur2(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!child.resolved || child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kafka_murmur2 expects BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "kafka_murmur2"

  override protected def nullSafeEval(input: Any): Any =
    KHash.murmur2(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KHash.murmur2($c)")

  override protected def withNewChildInternal(newChild: Expression): KafkaMurmur2 =
    copy(child = newChild)
}
