package graft

import graft.core.Tables
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Evidence for the TRAINED quality classifier (§2c.44c/d/e) — the
  * half the cross-engine hash gate cannot carry (the d×d ridge solve
  * is float): the served weights SOLVE the hash-oracled moment
  * system within the micro-rounding bound, the build is
  * deterministic, and the learned filter actually distills the gate
  * (accuracy far above both the majority class and the md5 stand-in
  * twin).
  */
class ClassifierSpec extends SparkSpec {

  private def docs = TextAnalysis.plantC4Docs(
    Tables.documents(spark, sfDir), col("text"), col("doc_id"))

  test("served weights solve the oracled moment system (exact residual bound)") {
    val d = TextAnalysis.ClfD
    val moments = TextAnalysis.clfMoments(docs, col("text"), col("doc_id"))
      .collect()
    val a = Array.ofDim[Double](d, d)
    val b = new Array[Double](d)
    moments.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val v = r.getLong(2).toDouble
      if (j == d) b(i) = v else { a(i)(j) = v; a(j)(i) = v }
    }
    val lambda = 1.0
    (0 until d).filter(_ != d - 1).foreach(i => a(i)(i) += lambda)
    val w = new Array[Double](d)
    TextAnalysis.ridgeWeights(spark,
      TextAnalysis.clfMoments(docs, col("text"), col("doc_id")))
      .collect().foreach(r => w(r.getInt(0)) = r.getLong(1) / 1e6)
    (0 until d).foreach { i =>
      val r = (0 until d).map(j => a(i)(j) * w(j)).sum - b(i)
      // bound: micro-rounding of each weight (≤ 0.5e-6) through row i
      // + float-solve slack relative to the row's magnitude
      val tol = (0 until d).map(j => math.abs(a(i)(j))).sum * 0.5e-6 +
        1e-9 * math.abs(b(i)) + 1.0
      assert(math.abs(r) <= tol, s"row $i residual $r > $tol")
    }
  }

  test("weight build is deterministic") {
    def build() = TextAnalysis.ridgeWeights(spark,
        TextAnalysis.clfMoments(docs, col("text"), col("doc_id")))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(build() === build())
  }

  test("the trained filter distills the gate: beats majority class and the md5 stand-in") {
    val w = TextAnalysis.ridgeWeights(spark,
      TextAnalysis.clfMoments(docs, col("text"), col("doc_id")))
    val eval = TextAnalysis.clfTrainedEval(docs, col("text"), col("doc_id"), w)
      .head()
    val (tp, fp, fn, tn, n) = (eval.getLong(0), eval.getLong(1),
      eval.getLong(2), eval.getLong(3), eval.getLong(4))
    assert(tp + fp + fn + tn === n)
    val acc = (tp + tn).toDouble / n
    // non-degenerate labels: both classes present in force
    val nPos = tp + fn; val nNeg = fp + tn
    assert(nPos > n / 10 && nNeg > n / 10, s"degenerate labels $nPos/$nNeg")
    val majority = math.max(nPos, nNeg).toDouble / n
    assert(acc >= 0.90, s"accuracy $acc")
    assert(acc > majority, s"accuracy $acc <= majority $majority")
    // the md5 stand-in twin scores with arbitrary weights — its
    // agreement with the gate is chance-level; the trained model must
    // clearly beat it (the reason to train at all)
    val standin = TextAnalysis.linearClassifier(docs, col("text"), col("doc_id"))
      .select(col("doc_id"), col("pass").cast("long").as("p"))
      .join(TextAnalysis.clfLabels(docs, col("text"), col("doc_id")), "doc_id")
      .agg(avg(when(col("p") === col("y"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc > standin + 0.1, s"trained $acc vs standin $standin")
  }
}
