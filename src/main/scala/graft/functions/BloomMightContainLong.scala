package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership test over a LONG column as a native codegen
  * expression — the map-side prune of the bloom decontamination path
  * (`Sampling.decontaminateBloom`).
  *
  * The filter is carried as a BROADCAST (one copy per executor, not one per
  * task closure) and read into a mutable codegen state once per generated
  * class, so the per-row cost is exactly one `mightContainLong` probe inside
  * whole-stage codegen — no UDF boundary, no boxing, no per-row broadcast
  * dereference.
  *
  * The caller hashes whatever it is filtering to a Long FIRST (xxhash64
  * here) and inserts the same hash on the build side, so there is no
  * put-path/probe-path encoding ambiguity: a true member can never be
  * missed, and a hash collision is just one more false positive for the
  * exact confirm join to kill.
  */
case class BloomMightContainLong(child: Expression,
                                 bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.resolved || child.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a BIGINT child, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter = bloom.value

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      "org.apache.spark.broadcast.Broadcast")
    val filterCls = "org.apache.spark.util.sketch.BloomFilter"
    val bloomVar = ctx.addMutableState(filterCls, "bloomFilter",
      v => s"$v = ($filterCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $bloomVar.mightContainLong($x);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContainLong = copy(child = newChild)
}
