package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 same-JVM paired A/B (the MmrStudy/PcaStudy template) for the
  * three kernels that moved from interpreted HOF spellings to native
  * codegen'd loop expressions (functions/MlKernels):
  *
  *   - ml_kmeans        vs kmeans_v1 (HOF argmin + HOF micro convert)
  *   - ml_naive_bayes   vs nb_v1     (HOF per-doc argmax)
  *   - ..._scrub        vs scrub_v1  (HOF O(tokens×covered) filter)
  *   - basket_pairs     — stable control of similar cost
  *
  * Arms alternate inside each round so host drift hits both spellings
  * equally, and the WITHIN-PAIR order flips every round: the first run
  * of a pair inherits the previous query's GC/cleanup debt (measured —
  * the original fixed order read the native scrub 2.4× slower than v1
  * while a dedicated alternating probe, ScrubStageProbe, read the two
  * identical), so a fixed order systematically taxes one spelling.
  * Report = per-arm medians + native/v1 ratios.
  */
object KernelStudy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def timeDf(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      clearState()
      t
    }
    def emb = graft.core.Tables.embeddings(spark, sfDir)
    def docs = graft.core.Tables.documents(spark, sfDir)
    type Arm = (String, () => org.apache.spark.sql.DataFrame)
    val pairs: Seq[(Arm, Arm)] = Seq(
      ("ml_kmeans" -> (() => SparkEntry.queries("ml_kmeans")(spark, sfDir)),
       "kmeans_v1" -> (() => graft.ops.KMeans.assign(emb, col("embedding"),
         col("vec_id"), k = 8, iterations = 3, nativeKernel = false))),
      ("ml_naive_bayes" -> (() =>
         SparkEntry.queries("ml_naive_bayes")(spark, sfDir)),
       "nb_v1" -> (() => graft.ops.TextAnalysis.naiveBayesConfusion(docs,
         col("text"), col("doc_id"), col("lang"), nativeKernel = false))),
      ("scrub" -> (() =>
         SparkEntry.queries("dedup_exact_substring_scrub")(spark, sfDir)),
       "scrub_v1" -> (() => graft.ops.Dedup.exactSubstrScrub(
         graft.ops.Dedup.plantSpanDups(docs), col("text"), col("doc_id"),
         nativeKernel = false))))
    val control: Arm =
      "basket_pairs" -> (() => SparkEntry.queries("basket_pairs")(spark, sfDir))
    val arms: Seq[Arm] = pairs.flatMap(p => Seq(p._1, p._2)) :+ control
    // warmup (codegen caches)
    arms.foreach { case (_, f) => timeDf(f()) }
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to rounds).foreach { r =>
      val ordered = pairs.flatMap { case (a, b) =>
        if (r % 2 == 1) Seq(a, b) else Seq(b, a)
      } :+ control
      ordered.foreach { case (n, f) => samples(n) = samples(n) :+ timeDf(f()) }
    }
    def med(v: Vector[Double]): Double = v.sorted.apply(v.size / 2)
    def r2(x: Double) = math.round(x * 100.0) / 100.0
    val pairsOut = Seq(
      ("ml_kmeans", "kmeans_v1"),
      ("ml_naive_bayes", "nb_v1"),
      ("scrub", "scrub_v1")).map { case (a, b) =>
      s""""${a}_med":${r2(med(samples(a)))},"${b}_med":${r2(med(samples(b)))},""" +
        s""""${a}_over_v1":${r2(med(samples(a)) / med(samples(b)))}"""
    }.mkString(",")
    println(s"""{"study":"kernel_ab","sf":"$sfDir","rounds":$rounds,""" +
      pairsOut +
      s""","basket_pairs_med":${r2(med(samples("basket_pairs")))},""" +
      s""""samples":{${arms.map { case (n, _) => "\"" + n + "\":[" +
        samples(n).map(r2).mkString(",") + "]" }.mkString(",")}}}""")
    spark.stop()
  }
}
