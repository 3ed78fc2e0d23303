package graft

import org.apache.spark.sql.SparkSession

/** r13-verdict watch item: `search_mmr` drifted 3.54 → 4.30 s (×1.21)
  * in a round whose shared-row median was ×1.05, and sits on the
  * official regressions list vs best-known (×1.65) — on UNCHANGED
  * code. Same-JVM paired A/B (the VecNullStudy pattern): interleave
  * search_mmr with two stable CONTROL queries of similar cost class
  * in one session, alternating, and report medians + the
  * mmr/control ratio. If the ratio matches the r12-era artifacts'
  * ratio, the drift is host-epoch noise (the controls drift with
  * it); a code- or cache-pressure-local regression would move the
  * ratio, not just the absolute numbers.
  *
  * r12/r13 artifact ratios for reference (bench_official/BENCH_r13):
  *   r12: mmr 3.54 / basket_pairs 1.85 = 1.91; mmr / ann_ivfpq_p 2.50 = 1.42
  *   r13: mmr 4.30 / basket_pairs 1.54 = 2.79; mmr / ann_ivfpq_p 2.10 = 2.05
  * (so r13's drift ALREADY moved the ratio — this study measures the
  * ratio cleanly within one JVM to decide which round's ratio is the
  * code's true shape.)
  */
object MmrStudy {
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
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      clearState()
      t
    }
    val names = Seq("search_mmr", "basket_pairs", "ann_ivfpq_topk_portable")
    // warmup (codegen + artifact builds)
    names.foreach(time)
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to rounds).foreach { _ =>
      names.foreach(n => samples(n) = samples(n) :+ time(n))
    }
    def med(v: Vector[Double]): Double = v.sorted.apply(v.size / 2)
    val mMmr = med(samples("search_mmr"))
    val mBp = med(samples("basket_pairs"))
    val mIp = med(samples("ann_ivfpq_topk_portable"))
    def r2(x: Double) = math.round(x * 100.0) / 100.0
    println(s"""{"study":"mmr_ab","sf":"$sfDir","rounds":$rounds,""" +
      s""""search_mmr_med":${r2(mMmr)},"basket_pairs_med":${r2(mBp)},""" +
      s""""ann_ivfpq_portable_med":${r2(mIp)},""" +
      s""""mmr_over_basket":${r2(mMmr / mBp)},""" +
      s""""mmr_over_ivfpq":${r2(mMmr / mIp)},""" +
      s""""samples":{${names.map(n => "\"" + n + "\":[" +
        samples(n).map(r2).mkString(",") + "]").mkString(",")}}}""")
    spark.stop()
  }
}
