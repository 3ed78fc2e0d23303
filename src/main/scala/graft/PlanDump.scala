package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 optimization-round evidence tool: writes
  * `plans/r15/<query>_before.txt` / `_after.txt` — the FORMATTED
  * physical plan (executed first, so AQE's final plan) of each
  * optimized query beside its retained pre-r15 spelling (the
  * `*V1` functions kept for paired A/B + bit-equality specs).
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
    // before = the retained pre-r15 spelling; after = the shipped query
    val pairs: Map[String, (() => DataFrame, () => DataFrame)] = Map(
      "embed_pca" -> (
        (() => graft.ops.Embed.pcaPowerV1(emb,
          col("embedding"), col("vec_id"), iterations = 3)),
        (() => SparkEntry.queries("embed_pca")(spark, sfDir))),
      "search_mmr" -> (
        (() => graft.ops.Search.mmrTopKV1(emb,
          col("embedding"), col("vec_id"),
          emb.where(col("vec_id") < 10), k = 5, shortlist = 20)),
        (() => SparkEntry.queries("search_mmr")(spark, sfDir)))
    ) ++ extraPairs(spark, sfDir)

    val names = if (args.length > 1) args.drop(1).toSeq else pairs.keys.toSeq.sorted
    new java.io.File("plans/r15").mkdirs()
    names.foreach { n =>
      val (before, after) = pairs(n)
      Seq("before" -> before, "after" -> after).foreach { case (tag, f) =>
        val out = new java.io.PrintWriter(s"plans/r15/${n}_$tag.txt")
        try {
          val qe = f().queryExecution
          qe.toRdd.count() // final adaptive plan
          out.println(qe.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch { case e: Throwable =>
          out.println(s"plan failed: ${e.getMessage}")
        } finally out.close()
        println(s"wrote plans/r15/${n}_$tag.txt")
      }
    }
    spark.stop()
  }

  /** queries whose before/after pair is expressed some other way
    * (filled in as the round proceeds) */
  private def extraPairs(spark: SparkSession, sfDir: String):
      Map[String, (() => DataFrame, () => DataFrame)] = Map.empty
}
