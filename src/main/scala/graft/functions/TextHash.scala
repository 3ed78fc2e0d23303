package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash document fingerprint (Rabin-Karp / winnowing style):
  * 64-bit polynomial hashes of every `window`-byte window of the
  * UTF-8 text (natural wraparound arithmetic — deterministic), folded
  * to the minimum window hash. Two documents sharing long byte runs
  * tend to share the minimum; exact duplicates always do.
  *
  * Native expression with doGenCode: one pass over the UTF8String
  * bytes (no copy — getByte), O(n) per row, stays inside whole-stage
  * codegen. Texts shorter than the window hash their full length.
  */
case class RollingMinHash(child: Expression, window: Int = 16)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"

  private val B = 1000003L
  /** B^window for the rolling subtract */
  private val BPow: Long = {
    var p = 1L; var i = 0
    while (i < window) { p *= B; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val w = math.min(window, math.max(n, 1))
    var h = 0L
    var min = Long.MaxValue
    var i = 0
    while (i < n) {
      h = h * B + (s.getByte(i) & 0xffL)
      if (i >= w) h -= (s.getByte(i - w) & 0xffL) * BPow
      if (i >= w - 1 && java.lang.Long.compareUnsigned(h, min) < 0) min = h
      i += 1
    }
    if (n == 0) 0L else min
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val w = ctx.freshName("w")
      val h = ctx.freshName("h"); val min = ctx.freshName("min")
      val i = ctx.freshName("i")
      s"""
         |int $n = $v.numBytes();
         |int $w = java.lang.Math.min($window, java.lang.Math.max($n, 1));
         |long $h = 0L;
         |long $min = Long.MAX_VALUE;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = $h * ${B}L + ($v.getByte($i) & 0xffL);
         |  if ($i >= $w) $h -= ($v.getByte($i - $w) & 0xffL) * ${BPow}L;
         |  if ($i >= $w - 1 && java.lang.Long.compareUnsigned($h, $min) < 0) $min = $h;
         |}
         |${ev.value} = ($n == 0) ? 0L : $min;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object TextHash {
  /** winnowed rolling-hash fingerprint of a string column */
  def rollingMinHash(text: Column, window: Int = 16): Column =
    GraftShims.column(RollingMinHash(GraftShims.expression(text), window))
}
