package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native Catalyst expression — the first
  * step of the CCNet/RefinedWeb text-cleaning recipe (normalize →
  * lowercase → strip accents → collapse whitespace) that Spark's
  * built-in function set lacks entirely.
  *
  * `form` is one of NFC/NFD/NFKC/NFKD (java.text.Normalizer). The
  * already-normalized fast path returns the input UTF8String without
  * re-encoding: real web corpora are overwhelmingly NFC already, so
  * the common case is a pure check, no allocation.
  *
  * Engine portability: NFC/NFKC here mirror DuckDB's `nfc_normalize`
  * (both implement UAX #15); the accent-strip recipe built on the NFD
  * form (decompose, drop `\p{Mn}` combining marks) is the documented
  * equivalent of DuckDB's `strip_accents` on Latin scripts.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val javaForm: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (Normalizer.isNormalized(s, javaForm)) u
    else UTF8String.fromString(Normalizer.normalize(s, javaForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val s = ctx.freshName("s")
      val f = s"java.text.Normalizer.Form.$form"
      s"""
         |String $s = $v.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, $f)
         |  ? $v
         |  : UTF8String.fromString(java.text.Normalizer.normalize($s, $f));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  def apply(c: Column, form: String): Column =
    GraftShims.column(UnicodeNormalize(GraftShims.expression(c), form))
}
