package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Morton (Z-order) interleave of the low 32 bits of two longs —
  * the space-filling-curve key behind multi-dimensional data
  * clustering (the Delta/Iceberg OPTIMIZE ZORDER layout device): rows
  * sorted by z(a,b) land in files whose (a,b) bounding boxes are
  * small SQUARES instead of full-domain stripes, so parquet min/max
  * stats prune a 2-D range query on EITHER or both columns. Classic
  * bit-twiddling spread (Morton 1966 / the standard "interleave by
  * magic masks" sequence), codegen'd — one expression, no UDF.
  *
  * Reads the LOW 32 BITS only: callers must pass values in
  * [0, 2^32) or the order is meaningless. The store's writeZOrdered
  * guarantees this by construction — it min/max-scales each key to a
  * 16-bit bucket id before interleaving (which also fixes the
  * unequal-domain degeneration; see writeZOrdered's doc), so ANY
  * long domain, negative keys included, arrives here well-bounded.
  */
case class ZInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "z_interleave"

  @inline private def spread(v0: Long): Long = {
    // spread the low 32 bits of v into the even bit positions
    var v = v0 & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sp = ctx.freshName("spread")
      val spFn = ctx.addNewFunction(sp,
        s"""
           |private long $sp(long v) {
           |  v &= 0xffffffffL;
           |  v = (v | (v << 16)) & 0x0000ffff0000ffffL;
           |  v = (v | (v << 8))  & 0x00ff00ff00ff00ffL;
           |  v = (v | (v << 4))  & 0x0f0f0f0f0f0f0f0fL;
           |  v = (v | (v << 2))  & 0x3333333333333333L;
           |  v = (v | (v << 1))  & 0x5555555555555555L;
           |  return v;
           |}
         """.stripMargin)
      s"${ev.value} = $spFn($a) | ($spFn($b) << 1);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleave =
    copy(left = newLeft, right = newRight)
}

object ZInterleave {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(
      ZInterleave(GraftShims.expression(a), GraftShims.expression(b)))
}
