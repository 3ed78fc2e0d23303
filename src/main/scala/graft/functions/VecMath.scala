package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native Catalyst expression for the float-vector dot product.
  *
  * The similarity operators' hot loop is Σ aᵢ·bᵢ over array<float>
  * pairs. The declarative spelling (`zip_with` + `aggregate`) builds
  * an intermediate array and evaluates lambdas interpreted —
  * measured ~50× slower over millions of pairs. This expression
  * reads both ArrayData buffers directly and participates in
  * whole-stage codegen (sequential i-ascending accumulation, same
  * fold order as the lambda spelling and the DuckDB oracle, so
  * results are bit-identical).
  *
  * Null handling: a null array yields null (BinaryExpression default);
  * null *elements* are not expected in embedding data and read as 0.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature (Charikar 2002) as one codegen'd
  * loop: bit b of the result = sign of the projection of the input
  * float vector onto fixed ±1 plane b. The declarative spelling
  * (nbits × dim `element_at` chains) builds a ~1000-node expression
  * tree per row; this is a 2-level loop over the raw ArrayData and a
  * referenced plane matrix.
  */
case class VecLshSig(child: Expression, planes: Array[Double], nbits: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_lsh_sig"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var sig = 0L
    var b = 0
    while (b < nbits) {
      var s = 0.0
      var d = 0
      while (d < n) { s += v.getFloat(d).toDouble * planes(b * dim + d); d += 1 }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long $sig = 0L;
         |for (int $b = 0; $b < $nbits; $b++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $s += (double)$v.getFloat($d) * $planesRef[$b * $dim + $d];
         |  }
         |  if ($s >= 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecLshSig =
    copy(child = newChild)
}

/** unit-normalize an array<float> in ONE codegen'd loop: norm
  * accumulated in index order as double (identical accumulation to
  * `sqrt(vec_dot(v, v))`), floored at 1e-30, each element divided in
  * double and rounded back to float — bit-identical to the staged
  * `transform(v, x -> (x / nrm)::float)` spelling it replaces, which
  * was CodegenFallback (interpreted per element on every corpus row
  * of the PQ/IVF-PQ encode path — the r11 standing-audit finding).
  *
  * Null ELEMENTS are handled explicitly (the staged spelling's
  * semantics, which an unchecked getFloat would silently corrupt):
  * a null element contributes 0 to the norm and stays null in the
  * output, and the output's containsNull mirrors the input's — so
  * parquet embeddings (whose list elements read as nullable) are
  * legal input and a vector that actually carries nulls propagates
  * them instead of yielding wrong values.
  *
  * STATIC no-null specialization (r13, the r12 ANN-drift watch item):
  * when the input type declares containsNull=false, the per-element
  * isNullAt branch is omitted from the GENERATED code entirely (and
  * skipped in eval) — the hot loop is the r11 primitive loop again,
  * with the null-handling path kept only for inputs whose type says
  * elements may actually be null.
  */
case class VecUnit(child: Expression) extends UnaryExpression {

  private def elemsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_unit requires array<float> input, got $other")
    }

  override def dataType: DataType = ArrayType(FloatType,
    containsNull = child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  override def prettyName: String = "vec_unit"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var hasNull = false
    var i = 0
    if (!elemsNullable) {
      while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    } else while (i < n) {
      if (x.isNullAt(i)) hasNull = true
      else { val v = x.getFloat(i).toDouble; s += v * v }
      i += 1
    }
    val nrm = math.max(math.sqrt(s), 1e-30)
    if (!hasNull) {
      val out = new Array[Float](n)
      i = 0
      while (i < n) {
        out(i) = (x.getFloat(i).toDouble / nrm).toFloat; i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) =
          if (x.isNullAt(i)) null
          else (x.getFloat(i).toDouble / nrm).toFloat
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nrm = ctx.freshName("nrm")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      if (!elemsNullable)
        // containsNull=false input: the generated hot loop carries NO
        // per-element null branch at all (the r11 primitive loop)
        s"""
           |int $n = $a.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double v = (double)$a.getFloat($i); $s += v * v;
           |}
           |double $nrm = java.lang.Math.max(java.lang.Math.sqrt($s), 1e-30);
           |float[] $out = new float[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = (float)((double)$a.getFloat($i) / $nrm);
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions
           |  .UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
      else {
        val boxed = ctx.freshName("boxed")
        val hasNull = ctx.freshName("hasNull")
        s"""
           |int $n = $a.numElements();
           |double $s = 0.0;
           |boolean $hasNull = false;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { $hasNull = true; }
           |  else { double v = (double)$a.getFloat($i); $s += v * v; }
           |}
           |double $nrm = java.lang.Math.max(java.lang.Math.sqrt($s), 1e-30);
           |if (!$hasNull) {
           |  float[] $out = new float[$n];
           |  for (int $i = 0; $i < $n; $i++) {
           |    $out[$i] = (float)((double)$a.getFloat($i) / $nrm);
           |  }
           |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
           |    .UnsafeArrayData.fromPrimitiveArray($out);
           |} else {
           |  Object[] $boxed = new Object[$n];
           |  for (int $i = 0; $i < $n; $i++) {
           |    $boxed[$i] = $a.isNullAt($i) ? null
           |      : (Object)(Float)(float)((double)$a.getFloat($i) / $nrm);
           |  }
           |  ${ev.value} =
           |    new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildInternal(newChild: Expression): VecUnit =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) fold for product-quantized codes:
  * Σⱼ dtabs[j][(code >>> j·bits) & mask] over the m subspaces, as ONE
  * generated loop.
  *
  * The declarative spelling (m unrolled `element_at(element_at(dtabs,
  * j+1), shr(code, j·bits) & mask + 1)` terms summed) expands to a
  * generated `processNext()` large enough that janino fails to compile
  * it — Spark logs `ERROR CodeGenerator` and SILENTLY disables
  * whole-stage codegen for the ADC scan stage, interpreting the
  * hottest per-row arithmetic of the PQ family. This expression is the
  * same fold (j-ascending double accumulation — bit-identical to the
  * unrolled sum and the DuckDB oracle mirror) in a loop the size of a
  * postcard.
  *
  * Null handling: null code or null dtabs → null (BinaryExpression
  * default); inner tables are dense non-null query-side constants.
  */
case class PqAdc(left: Expression, right: Expression, m: Int, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val codeOk = left.dataType == LongType
    val tabsOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (codeOk && tabsOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (bigint, array<array<double>>), got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  private val mask: Long = (1L << bits) - 1

  override def nullSafeEval(codeAny: Any, tabsAny: Any): Any = {
    val code = codeAny.asInstanceOf[Long]
    val tabs = tabsAny.asInstanceOf[ArrayData]
    var s = 0.0
    var j = 0
    while (j < m) {
      val sub = ((code >>> (j * bits)) & mask).toInt
      s += tabs.getArray(j).getDouble(sub)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, tabs) => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val sub = ctx.freshName("sub")
      s"""
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $sub = (int)(($code >>> ($j * $bits)) & ${mask}L);
         |  $s += $tabs.getArray($j).getDouble($sub);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** Shared driver-side constants for the PQ expressions: per-centroid
  * ‖c‖² tables, folded once with the exact arithmetic the previous
  * literal spelling used (ascending double fold over float squares).
  */
private[functions] object PqTables {
  def ccTables(books: Array[Array[Array[Float]]]): Array[Array[Double]] =
    books.map(_.map(_.map(x => x.toDouble * x.toDouble).sum))
}

/** Per-query ADC distance tables as ONE generated 3-level loop:
  * out[j][c] = ‖cⱼ꜀‖² − 2·⟨qⱼ, cⱼ꜀⟩ over the m×ks codebook entries.
  *
  * The declarative spelling (an `array(array(...))` of m·ks unrolled
  * [[graft.ops.Similarity]] centApproxDist terms — 256 inline vecDot
  * loops at the default m=16, ks=16) generates a `processNext()` that
  * janino rejects with "Code grows beyond 64 KB"; Spark then silently
  * disables whole-stage codegen for the stage (r13 verdict #1). Same
  * arithmetic in the same fold order (ascending double accumulation,
  * ‖c‖² folded driver-side exactly as the literal was) — results are
  * bit-identical, the generated code is three nested loops.
  */
case class PqDistTables(child: Expression, books: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_dist_tables requires array<float>, got $t")
    }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_dist_tables"

  private val m = books.length
  private val sub = books(0)(0).length
  @transient private lazy val cc = PqTables.ccTables(books)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val tabs = new Array[Any](m)
    var j = 0
    while (j < m) {
      val off = j * sub
      val n = math.max(0, math.min(v.numElements() - off, sub))
      val row = new Array[Double](books(j).length)
      var c = 0
      while (c < row.length) {
        val cent = books(j)(c)
        var dot = 0.0
        var d = 0
        while (d < n) {
          dot += v.getFloat(off + d).toDouble * cent(d).toDouble
          d += 1
        }
        row(c) = cc(j)(c) - dot * 2
        c += 1
      }
      tabs(j) = new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(tabs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "float[][][]")
    val ccRef = ctx.addReferenceObj("cc", PqTables.ccTables(books), "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val tabs = ctx.freshName("tabs")
      val row = ctx.freshName("row")
      val cent = ctx.freshName("cent")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      s"""
         |Object[] $tabs = new Object[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $off = $j * $sub;
         |  int $n = java.lang.Math.max(0,
         |    java.lang.Math.min($v.numElements() - $off, $sub));
         |  double[] $row = new double[$booksRef[$j].length];
         |  for (int $c = 0; $c < $row.length; $c++) {
         |    float[] $cent = $booksRef[$j][$c];
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $dot += (double)$v.getFloat($off + $d) * (double)$cent[$d];
         |    }
         |    $row[$c] = $ccRef[$j][$c] - $dot * 2;
         |  }
         |  $tabs[$j] =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($tabs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTables =
    copy(child = newChild)
}

/** PQ encode as ONE generated loop: pack each subspace's
  * nearest-centroid index (ties → smallest code, matching the
  * struct-`array_min` spelling it replaces) into bits
  * [j·bits, (j+1)·bits) of one long. Replaces the m×ks unrolled
  * struct/array_min expression tree for the same 64 KB reason as
  * [[PqDistTables]]. The dropped ‖s‖² is constant per (row, subspace),
  * so the argmin matches true sub-space L2.
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Float]]],
                    bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires array<float>, got $t")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_encode"

  private val m = books.length
  private val sub = books(0)(0).length
  @transient private lazy val cc = PqTables.ccTables(books)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var code = 0L
    var j = 0
    while (j < m) {
      val off = j * sub
      val n = math.max(0, math.min(v.numElements() - off, sub))
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < books(j).length) {
        val cent = books(j)(c)
        var dot = 0.0
        var d = 0
        while (d < n) {
          dot += v.getFloat(off + d).toDouble * cent(d).toDouble
          d += 1
        }
        val dist = cc(j)(c) - dot * 2
        // strict < keeps the FIRST (smallest-c) minimum — the
        // array_min-over-(d, code)-structs tie rule
        if (dist < best) { best = dist; bestC = c }
        c += 1
      }
      code |= bestC.toLong << (j * bits)
      j += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "float[][][]")
    val ccRef = ctx.addReferenceObj("cc", PqTables.ccTables(books), "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val code = ctx.freshName("code")
      val cent = ctx.freshName("cent")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      s"""
         |long $code = 0L;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $off = $j * $sub;
         |  int $n = java.lang.Math.max(0,
         |    java.lang.Math.min($v.numElements() - $off, $sub));
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $booksRef[$j].length; $c++) {
         |    float[] $cent = $booksRef[$j][$c];
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $dot += (double)$v.getFloat($off + $d) * (double)$cent[$d];
         |    }
         |    double $dist = $ccRef[$j][$c] - $dot * 2;
         |    if ($dist < $best) { $best = $dist; $bestC = $c; }
         |  }
         |  $code |= ((long)$bestC) << ($j * $bits);
         |}
         |${ev.value} = $code;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object VecMath {
  /** codegen'd Σ aᵢ·bᵢ as double */
  def vecDot(a: Column, b: Column): Column =
    GraftShims.column(
      VecDot(GraftShims.expression(a), GraftShims.expression(b)))

  /** codegen'd one-loop unit normalization (see [[VecUnit]]) */
  def vecUnit(v: Column): Column =
    GraftShims.column(VecUnit(GraftShims.expression(v)))

  /** ‖a‖₂ via the codegen'd dot */
  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** codegen'd nbits-bit random-hyperplane signature over fixed ±1
    * planes (deterministic, supplied by the caller).
    */
  def vecLshSig(v: Column, planes: Array[Double], nbits: Int, dim: Int): Column =
    GraftShims.column(VecLshSig(GraftShims.expression(v), planes, nbits, dim))

  /** codegen'd one-loop ADC fold (see [[PqAdc]]) */
  def pqAdc(code: Column, dtabs: Column, m: Int, bits: Int): Column =
    GraftShims.column(
      PqAdc(GraftShims.expression(code), GraftShims.expression(dtabs), m, bits))

  /** codegen'd 3-level-loop per-query ADC tables (see [[PqDistTables]]) */
  def pqDistTables(qv: Column, books: Array[Array[Array[Float]]]): Column =
    GraftShims.column(PqDistTables(GraftShims.expression(qv), books))

  /** codegen'd one-loop PQ encode (see [[PqEncode]]) */
  def pqEncode(v: Column, books: Array[Array[Array[Float]]], bits: Int): Column =
    GraftShims.column(PqEncode(GraftShims.expression(v), books, bits))
}
