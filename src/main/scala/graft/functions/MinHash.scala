package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** k-permutation MinHash signature (Broder 1997) of a shingle array
  * as ONE native codegen'd expression: per shingle, xxhash64 (same
  * XXH64/seed-42 as Spark's `xxhash64()` builtin) folded to
  * x = h mod p (p = 2³¹−1), then min over (aᵢ·x + bᵢ) mod p per
  * permutation — all in a single pass over the array.
  *
  * Why native: the declarative spellings are either (a) explode +
  * groupBy with k min() aggregates — a full shuffle of the shingle
  * stream (~10× the text bytes at 100 TB), or (b) k higher-order
  * `transform`/`array_min` calls — which are CodegenFallback in
  * Spark: interpreted per row with k intermediate boxed arrays
  * (measured 12× slower than the grouped build at sf0.1). This
  * expression is MAP-ONLY, allocation-light, stays inside whole-stage
  * codegen, and is stateless — usable in streaming projections.
  *
  * Signature values are bit-identical to both declarative spellings
  * (same hash, same permutation family — spec-checked); an empty
  * shingle array yields an array of k nulls, mirroring
  * `array_min(empty) = null`; null elements are skipped (they cannot
  * occur in arrays built by `array_join`).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires array<string>, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val (as, bs): (Array[Long], Array[Long]) = {
    val ps = MinHash.permParams(k)
    (ps.map(_._1).toArray, ps.map(_._2).toArray)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = MinHash.signature(arr, as, bs)
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", as, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      s"""
         |Object[] $out = graft.functions.MinHash.signature($v, $aRef, $bRef);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** count of positions where two equal-length long arrays agree — the
  * MinHash estimated-Jaccard numerator, evaluated once per CANDIDATE
  * PAIR (the hottest row stream in the LSH join). The declarative
  * `aggregate(zip_with(...))` spelling is CodegenFallback
  * (HigherOrderFunction): interpreted, two boxed intermediate arrays
  * per pair. This is one codegen'd loop, zero allocation. A position
  * where either side is null does not match (mirrors
  * `when(x === y, 1).otherwise(0)` under null semantics).
  */
case class SigMatchCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sig_match_count requires (array<long>, array<long>), got ($l, $r)")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_match_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHash.matchCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.MinHash.matchCount($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigMatchCount =
    copy(left = newLeft, right = newRight)
}

object MinHash {
  /** p = 2³¹−1: a·x stays within a signed 64-bit long (a, x < 2³¹) */
  val MersenneP: Long = (1L << 31) - 1

  /** deterministic splitmix64-ish permutation parameter stream —
    * fixed seeds, reproducible across runs and engines
    */
  def permParams(k: Int): Seq[(Long, Long)] = {
    var s = 0x9e3779b97f4a7c15L
    def next(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (z ^ (z >>> 31)) & Long.MaxValue
    }
    (0 until k).map(_ => (next() % (MersenneP - 1) + 1, next() % MersenneP))
  }

  /** shared interpreted/codegen kernel: one pass over the shingles,
    * k running mins. All operands are non-negative, so plain % is
    * exactly Spark's pmod here.
    */
  def signature(arr: ArrayData, as: Array[Long], bs: Array[Long]): Array[Object] = {
    val k = as.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(i), 42L)
        val x = ((h % MersenneP) + MersenneP) % MersenneP
        var j = 0
        while (j < k) {
          val hx = ((x * as(j)) % MersenneP + bs(j)) % MersenneP
          if (hx < mins(j)) mins(j) = hx
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Object](k)
    var j = 0
    while (j < k) {
      out(j) = if (mins(j) == Long.MaxValue) null else java.lang.Long.valueOf(mins(j))
      j += 1
    }
    out
  }

  /** shared interpreted/codegen kernel for [[SigMatchCount]] */
  def matchCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** codegen'd k-permutation MinHash signature of an array<string> */
  def minhashSig(shingles: Column, k: Int): Column =
    GraftShims.column(MinHashSig(GraftShims.expression(shingles), k))

  /** codegen'd per-pair signature agreement count */
  def sigMatchCount(a: Column, b: Column): Column =
    GraftShims.column(SigMatchCount(
      GraftShims.expression(a), GraftShims.expression(b)))
}
