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

/** Winnowed k-gram fingerprint SET (Schleimer/Wilkerson/Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003): 64-bit Rabin-Karp hashes of every k-byte window of
  * the UTF-8 text, then robust winnowing with window `w` — in each
  * run of w consecutive k-gram hashes the minimum is selected
  * (rightmost on ties, recorded only when the selection changes).
  * GUARANTEE: two documents sharing any substring of at least
  * w + k - 1 bytes share at least one selected fingerprint — the
  * property [[graft.ops.Dedup.substringPairs]] builds on. Density is
  * ~2/(w+1) of the k-gram stream: a w-fold cost cut that keeps the
  * detection guarantee (unlike the global-min [[RollingMinHash]],
  * which is a 1-value sketch with no substring guarantee).
  *
  * Returns the distinct selected hashes sorted ascending (signed) —
  * deterministic, join-ready. Native doGenCode; the per-row loop
  * lives in [[TextHash.winnow]] (static call from generated code,
  * the [[TokenOps]] pattern).
  */
case class WinnowedHashes(child: Expression, k: Int = 16, w: Int = 8)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowed_hashes"

  override def nullSafeEval(input: Any): Any =
    TextHash.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextHash.winnow($v, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowedHashes =
    copy(child = newChild)
}

object TextHash {
  /** winnowed rolling-hash fingerprint of a string column */
  def rollingMinHash(text: Column, window: Int = 16): Column = {
    require(window >= 1, s"window must be >= 1, got $window")
    GraftShims.column(RollingMinHash(GraftShims.expression(text), window))
  }

  /** winnowed k-gram fingerprint set (see [[WinnowedHashes]]) */
  def winnowedHashes(text: Column, k: Int = 16, w: Int = 8): Column = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    GraftShims.column(WinnowedHashes(GraftShims.expression(text), k, w))
  }

  private val B = 1000003L

  /** robust winnowing over the k-gram rolling-hash stream — the
    * per-row engine behind [[WinnowedHashes]] (same hash polynomial
    * as [[RollingMinHash]]; unsigned comparisons). Texts shorter
    * than k hash their full length (one k-gram); empty → empty set.
    */
  def winnow(s: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = s.numBytes()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    val kk = math.min(k, n)
    var bpow = 1L
    var p = 0
    while (p < kk) { bpow *= B; p += 1 }
    val m = n - kk + 1
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < n) {
      h = h * B + (s.getByte(i) & 0xffL)
      if (i >= kk) h -= (s.getByte(i - kk) & 0xffL) * bpow
      if (i >= kk - 1) hs(i - kk + 1) = h
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      // one (partial) window: its minimum is the single selection
      var min = 0; var j = 1
      while (j < m) {
        if (java.lang.Long.compareUnsigned(hs(j), hs(min)) <= 0) min = j
        j += 1
      }
      sel.add(hs(min))
    } else {
      // standard incremental winnow: keep the index of the current
      // window's min; rescan only when it falls out of the window
      var minIdx = -1
      var start = 0
      val last = m - w
      while (start <= last) {
        val end = start + w - 1
        if (minIdx < start) {
          minIdx = start
          var j = start + 1
          while (j <= end) {
            if (java.lang.Long.compareUnsigned(hs(j), hs(minIdx)) <= 0) minIdx = j
            j += 1
          }
          sel.add(hs(minIdx))
        } else if (java.lang.Long.compareUnsigned(hs(end), hs(minIdx)) <= 0) {
          minIdx = end
          sel.add(hs(minIdx))
        }
        start += 1
      }
    }
    val out = new Array[Long](sel.size())
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
