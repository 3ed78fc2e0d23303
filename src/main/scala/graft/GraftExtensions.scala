package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{MinHashSig, RollingMinHash, SigMatchCount, SimHash64, UnicodeNormalize, VecDot, WinnowedHashes, WordShingles, ZInterleave}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions (so pure-SQL users get them too) and
  * the custom per-group top-k planner strategy:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT vec_dot(a.embedding, b.embedding) FROM ...")
  * spark.sql("SELECT rolling_min_hash(text) FROM docs")
  * spark.sql("SELECT simhash64(split(lower(text), ' ')) FROM docs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftExtensions {

  /** the SQL function catalog graft contributes */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))),
    (new FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
      (children: Seq[Expression]) =>
        RollingMinHash(children.head, GraftExtensions.intLit(children, 1, 16))),
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)),
    (new FunctionIdentifier("winnowed_hashes"),
      new ExpressionInfo(classOf[WinnowedHashes].getName, "winnowed_hashes"),
      (children: Seq[Expression]) =>
        WinnowedHashes(children.head, GraftExtensions.intLit(children, 1, 16),
          GraftExtensions.intLit(children, 2, 8))),
    (new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) =>
        WordShingles(children.head, GraftExtensions.intLit(children, 1, 3),
          distinct =
            GraftExtensions.intLit(children, 2, 1, min = 0) != 0)),
    (new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) =>
        MinHashSig(children.head, GraftExtensions.intLit(children, 1, 16))),
    (new FunctionIdentifier("sig_match_count"),
      new ExpressionInfo(classOf[SigMatchCount].getName, "sig_match_count"),
      (children: Seq[Expression]) => SigMatchCount(children(0), children(1))),
    (new FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (children: Seq[Expression]) =>
        UnicodeNormalize(children.head, GraftExtensions.formLit(children, 1))),
    (new FunctionIdentifier("z_interleave"),
      new ExpressionInfo(classOf[ZInterleave].getName, "z_interleave"),
      (children: Seq[Expression]) => ZInterleave(children(0), children(1))))

  /** optional LITERAL normalization-form argument for
    * unicode_normalize (default NFC); validated at plan time against
    * java.text.Normalizer's forms so a typo fails the query, not the
    * executor.
    */
  private def formLit(children: Seq[Expression], i: Int): String = {
    if (children.length <= i) return "NFC"
    val c = children(i)
    if (!c.foldable) throw new IllegalArgumentException(
      s"argument ${i + 1} must be a string literal, got: ${c.sql}")
    val v = Option(c.eval()).map(_.toString.toUpperCase).getOrElse(
      throw new IllegalArgumentException(s"argument ${i + 1} must not be null"))
    if (!Set("NFC", "NFD", "NFKC", "NFKD").contains(v))
      throw new IllegalArgumentException(
        s"unknown normalization form '$v' (NFC/NFD/NFKC/NFKD)")
    v
  }

  /** evaluate an optional LITERAL int argument (defaults if absent).
    * Non-foldable expressions (a column, a nondeterministic call) and
    * null literals are rejected at plan time with the argument
    * position named — `eval()` on a non-foldable child would either
    * throw an opaque UnsupportedOperationException or silently freeze
    * one sampled value.
    */
  private def intLit(children: Seq[Expression], i: Int, dflt: Int,
                     min: Int = 1): Int = {
    if (children.length <= i) return dflt
    val c = children(i)
    if (!c.foldable) throw new IllegalArgumentException(
      s"argument ${i + 1} must be an integer literal, got: ${c.sql}")
    val v = c.eval() match {
      case x: Int => x
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case null => throw new IllegalArgumentException(
        s"argument ${i + 1} must not be null")
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} must be an integer literal, got: $other")
    }
    if (v < min) throw new IllegalArgumentException(
      s"argument ${i + 1} must be >= $min, got $v")
    v
  }

  /** register on an already-running session (same builders the
    * extension injects; for sessions not launched with the config)
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, b) =>
      org.apache.spark.sql.GraftShims.registerFunction(spark, id, info, b)
    }
}
