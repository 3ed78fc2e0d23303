package graft

import org.apache.spark.sql.SparkSession

/** scratch study: real bench-query cost of the two hot-key cap
  * spellings at sf0.1 (no planted hot key — the common case where the
  * grouped default pays a second signature evaluation).
  */
object SkewBenchStudy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = Seq("dedup_ngram_jaccard", "dedup_minhash", "dedup_simhash",
      "dedup_substring", "dedup_embedding", "dedup_incremental")
    def run(label: String, impl: String): Unit = {
      spark.conf.set(graft.ops.Skew.CapImplConf, impl)
      val times = qs.map { q =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        q -> (System.nanoTime() - t0) / 1e9
      }
      println(f"STUDY $label%-8s total=${times.map(_._2).sum}%.2f  " +
        times.map { case (q, t) => f"$q=$t%.2f" }.mkString(" "))
    }
    // warm all, then measure alternating
    run("warm-e", "exchange"); run("warm-g", "grouped"); run("warm-w", "window")
    run("exchange", "exchange"); run("grouped", "grouped"); run("window", "window")
    run("exchange", "exchange"); run("grouped", "grouped"); run("window", "window")
    spark.stop()
  }
}
