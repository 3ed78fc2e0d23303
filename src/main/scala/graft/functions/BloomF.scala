package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen'd expression — the
  * map-side prefilter behind [[graft.ops.Curation.contaminatedBloom]].
  *
  * The filter is built distributed (`DataFrame.stat.bloomFilter` runs
  * a treeAggregate of partial filters on the executors) and the merged
  * sketch — a few MB even for 10⁸ items at 1% FPR, vs gigabytes for
  * the exact value set — rides into codegen as a reference object,
  * exactly as [[CountInSet]] carries its word set. Probing costs a few
  * hash-bit reads per row, stays inside whole-stage codegen, and
  * allocates nothing (the value is hashed to a long BEFORE the probe,
  * so no per-row string materialization).
  */
object BloomF {

  /** `filter.mightContainLong(hash)` as a codegen'd Column predicate */
  def mightContainLong(hash: Column, filter: BloomFilter): Column =
    GraftShims.column(
      BloomMightContainLong(GraftShims.expression(hash), filter))
}

case class BloomMightContainLong(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_long requires bigint, got $t")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("bloom", filter,
      "org.apache.spark.util.sketch.BloomFilter")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $f.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
