package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r14-verdict "What's wrong #2": `embed_pca` has drifted UP three
  * rounds in a row on unchanged code — r12 1.42 s, r13 1.77 s, r14
  * 2.69 s — and, unlike a host-epoch wobble, its ratio against the
  * basket_pairs control moved WITH it (0.77 → 1.15 → 1.45), which is
  * the signature of a real regression, not noise. Same-JVM paired
  * A/B on the MmrStudy/VecNullStudy template: interleave, per round,
  *
  *   - `embed_pca`          — the shipped query (pcaPower, 3 iters)
  *   - `pca_iter1`          — pcaPower with ONE iteration: the
  *                            corpus-sized Gram pass plus a single
  *                            4096-row step, isolating the unrolled
  *                            per-iteration stage cost (suspect #2:
  *                            the 9-shuffle unrolled plan)
  *   - `pca_nockpt`         — pcaPower(3) WITHOUT the Gram
  *                            localCheckpoint (suspect #1: per-round
  *                            checkpoint accumulation / the /tmp
  *                            block-store footprint)
  *   - `basket_pairs`       — the stable control of similar cost
  *
  * and report medians + ratios. Decision rule: if
  * embed_pca/basket_pairs lands back near the r12 ratio (~0.8) the
  * r13/r14 drift was epoch after all (record in §7a); if it
  * reproduces the r14 ratio (~1.45), the drift is real at current
  * code and the iter1/nockpt arms say which suspect pays.
  */
object PcaStudy {
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
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    // r15 optimization round: `embed_pca` now runs the single-pass
    // co-moment shape (Embed.pcaPower); the pre-r15 three-corpus-pass
    // spelling rides along as `pca_v1` (pcaPowerV1) so the win is a
    // same-JVM paired measurement, not a cross-epoch diff. The two
    // legacy diagnostic arms keep their names against pcaPowerV1.
    val arms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "embed_pca" -> (() => SparkEntry.queries("embed_pca")(spark, sfDir)),
      "pca_v1" -> (() => graft.ops.Embed.pcaPowerV1(emb,
        col("embedding"), col("vec_id"), iterations = 3)),
      "pca_iter1" -> (() => graft.ops.Embed.pcaPower(emb,
        col("embedding"), col("vec_id"), iterations = 1)),
      "pca_nockpt" -> (() => graft.ops.Embed.pcaPowerV1(emb,
        col("embedding"), col("vec_id"), iterations = 3,
        checkpointGram = false)),
      "basket_pairs" -> (() => SparkEntry.queries("basket_pairs")(spark, sfDir)))
    // warmup (codegen caches)
    arms.foreach { case (_, f) => timeDf(f()) }
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to rounds).foreach { _ =>
      arms.foreach { case (n, f) => samples(n) = samples(n) :+ timeDf(f()) }
    }
    def med(v: Vector[Double]): Double = v.sorted.apply(v.size / 2)
    def r2(x: Double) = math.round(x * 100.0) / 100.0
    val mPca = med(samples("embed_pca"))
    val mV1 = med(samples("pca_v1"))
    val mIt1 = med(samples("pca_iter1"))
    val mNc = med(samples("pca_nockpt"))
    val mBp = med(samples("basket_pairs"))
    println(s"""{"study":"pca_ab","sf":"$sfDir","rounds":$rounds,""" +
      s""""embed_pca_med":${r2(mPca)},"pca_v1_med":${r2(mV1)},""" +
      s""""pca_iter1_med":${r2(mIt1)},""" +
      s""""pca_nockpt_med":${r2(mNc)},"basket_pairs_med":${r2(mBp)},""" +
      s""""pca_v2_over_v1":${r2(mPca / mV1)},""" +
      s""""pca_over_basket":${r2(mPca / mBp)},""" +
      s""""ref_ratios":{"r12":0.77,"r13":1.15,"r14":1.45},""" +
      s""""samples":{${arms.map { case (n, _) => "\"" + n + "\":[" +
        samples(n).map(r2).mkString(",") + "]" }.mkString(",")}}}""")
    spark.stop()
  }
}
