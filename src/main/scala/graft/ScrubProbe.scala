package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 diagnostic: KernelStudy read the native scrub_keep/nb_argmin
  * kernels SLOWER than the interpreted HOF spellings they replace
  * (2.4× / 1.2×) while km_argmin improved — plans identical except the
  * final Project joining WholeStageCodegen. This probe decomposes the
  * scrub final projection to find where the time actually goes:
  *
  *   - base_md5     : md5(array_join(toks)) — no filter at all
  *   - v1_size      : size(filter(toks, …array_contains…)) — HOF, no md5
  *   - native_size  : size(scrub_keep(toks, covp)) — native, no md5
  *   - v1_full      : the r15 projection (HOF filter + md5)
  *   - native_full  : the shipped r16 projection
  *
  * All arms share ONE materialized (toks, covp) input (localCheckpoint)
  * so only the projection differs.
  */
object ScrubProbe {
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

    def timeDf(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // one shared input: the scrub pipeline up to (doc_id, toks, covp)
    val docs = graft.ops.Dedup.plantSpanDups(
      graft.core.Tables.documents(spark, sfDir))
    val n = 12
    val joined = {
      // re-derive the (toks ⟕ covp) table the way exactSubstrScrub does
      val win = docs.select(col("doc_id"),
        explode(sequence(lit(1L),
          (size(split(col("text"), " ")) - (n - 1)).cast("long"))).as("p"),
        split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= n)
        .select(col("doc_id"), col("p"),
          md5(array_join(slice(col("toks"), col("p").cast("int"), lit(n)), " "))
            .as("w"))
      val minDoc = win.groupBy("w").agg(min("doc_id").as("keep_id"))
      val covered = win.join(minDoc, "w")
        .where(col("doc_id") > col("keep_id"))
        .groupBy("doc_id")
        .agg(sort_array(array_distinct(flatten(collect_list(
          sequence(col("p"), col("p") + (n - 1)))))).as("covp"))
      docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
        .where(col("toks").isNotNull)
        .join(covered, Seq("doc_id"), "left")
        .localCheckpoint()
    }

    val v1Filter = filter(col("toks"), (tok, i) =>
      !coalesce(array_contains(col("covp"), (i + 1).cast("long")),
        lit(false)))
    val natFilter = graft.functions.MlKernels.scrubKeep(
      col("toks"), col("covp"))
    val arms: Seq[(String, () => DataFrame)] = Seq(
      "base_md5" -> (() => joined.select(col("doc_id"),
        md5(array_join(col("toks"), " ")).as("h"))),
      "v1_size" -> (() => joined.select(col("doc_id"),
        size(v1Filter).as("s"))),
      "native_size" -> (() => joined.select(col("doc_id"),
        size(natFilter).as("s"))),
      "v1_full" -> (() => joined.select(col("doc_id"),
        md5(array_join(v1Filter, " ")).as("h"))),
      "native_full" -> (() => joined.select(col("doc_id"),
        md5(array_join(natFilter, " ")).as("h"))))
    arms.foreach { case (_, f) => timeDf(f()) } // warmup
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to rounds).foreach { _ =>
      arms.foreach { case (nm, f) => samples(nm) = samples(nm) :+ timeDf(f()) }
    }
    def med(v: Vector[Double]): Double = v.sorted.apply(v.size / 2)
    def r2(x: Double) = math.round(x * 100.0) / 100.0
    println(s"""{"study":"scrub_probe","sf":"$sfDir","rounds":$rounds,""" +
      arms.map { case (nm, _) => s""""${nm}_med":${r2(med(samples(nm)))}""" }
        .mkString(",") +
      s""","samples":{${arms.map { case (nm, _) => "\"" + nm + "\":[" +
        samples(nm).map(r2).mkString(",") + "]" }.mkString(",")}}}""")
    spark.stop()
  }
}
