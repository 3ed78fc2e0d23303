package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round evidence tool: writes
  * `plans/r16/<query>_before.txt` / `_after.txt` — the FORMATTED
  * physical plan (executed first, so AQE's final plan) of each
  * optimized query beside its retained pre-optimization spelling
  * (kept behind `nativeKernel=false` flags / `*V1` functions for
  * paired A/B + bit-equality specs). The r15 pairs live on in
  * `plans/r15/` (committed) — this main now dumps the r16 set.
  *
  * Usage: runMain graft.PlanDump [sfDir] [queryName...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def emb = graft.core.Tables.embeddings(spark, sfDir)
    def docs = graft.core.Tables.documents(spark, sfDir)
    // before = the retained pre-r16 spelling; after = the shipped query
    val pairs: Map[String, (() => DataFrame, () => DataFrame)] = Map(
      "ml_kmeans" -> (
        (() => graft.ops.KMeans.assign(emb, col("embedding"),
          col("vec_id"), k = 8, iterations = 3, nativeKernel = false)),
        (() => SparkEntry.queries("ml_kmeans")(spark, sfDir))),
      "ml_naive_bayes" -> (
        (() => graft.ops.TextAnalysis.naiveBayesConfusion(docs,
          col("text"), col("doc_id"), col("lang"), nativeKernel = false)),
        (() => SparkEntry.queries("ml_naive_bayes")(spark, sfDir))),
      "dedup_exact_substring_scrub" -> (
        (() => graft.ops.Dedup.exactSubstrScrub(
          graft.ops.Dedup.plantSpanDups(docs), col("text"), col("doc_id"),
          nativeKernel = false)),
        (() => SparkEntry.queries("dedup_exact_substring_scrub")(spark, sfDir)))
    ) ++ extraPairs(spark, sfDir)

    val names = if (args.length > 1) args.drop(1).toSeq else pairs.keys.toSeq.sorted
    new java.io.File("plans/r16").mkdirs()
    names.foreach { n =>
      val (before, after) = pairs(n)
      Seq("before" -> before, "after" -> after).foreach { case (tag, f) =>
        val out = new java.io.PrintWriter(s"plans/r16/${n}_$tag.txt")
        try {
          val qe = f().queryExecution
          qe.toRdd.count() // final adaptive plan
          out.println(qe.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch { case e: Throwable =>
          out.println(s"plan failed: ${e.getMessage}")
        } finally out.close()
        println(s"wrote plans/r16/${n}_$tag.txt")
      }
    }
    spark.stop()
  }

  /** queries whose before/after pair is expressed some other way
    * (filled in as the round proceeds) */
  private def extraPairs(spark: SparkSession, sfDir: String):
      Map[String, (() => DataFrame, () => DataFrame)] = Map.empty
}
