package graft

import org.apache.spark.sql.SparkSession

/** r15 optimization round: same-JVM paired A/B of scale-adaptive AQE
  * coalescing (guide §2.2 — "fewer, larger reduce partitions; let
  * AQE coalesce by size") against the default parallelism-first
  * coalescing, over a representative mid-cost query slice. The knob
  * under test is a RUNTIME SQL conf, so both arms alternate inside
  * one session: `spark.sql.adaptive.coalescePartitions.
  * parallelismFirst` (default true = split post-shuffle data down to
  * tiny partitions to fill cores; false = respect
  * advisoryPartitionSizeInBytes). At bench scale each shuffle stage
  * then runs ~1 task instead of ~cpus near-empty tasks; at 100 TB
  * the advisory size governs either way, so the setting is
  * scale-adaptive, not a local[32] trick.
  *
  * Usage: runMain graft.ConfStudy [sfDir] [rounds]
  */
object ConfStudy {
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
    val queries = Seq("q1_agg", "events_resample", "asof_join_nearest",
      "graph_pagerank", "dedup_ngram_jaccard", "ml_naive_bayes",
      "window_rank", "q5_join")
    def timeOne(name: String, pf: Boolean): Double = {
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst",
        pf.toString)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      clearState(); t
    }
    // warmup both arms
    queries.foreach { n => timeOne(n, pf = true); timeOne(n, pf = false) }
    val samples = scala.collection.mutable.Map
      .empty[(String, Boolean), Vector[Double]].withDefaultValue(Vector.empty)
    (1 to rounds).foreach { _ =>
      queries.foreach { n =>
        Seq(true, false).foreach { pf =>
          samples((n, pf)) = samples((n, pf)) :+ timeOne(n, pf)
        }
      }
    }
    def med(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    def r2(x: Double) = math.round(x * 100.0) / 100.0
    val per = queries.map { n =>
      val t = med(samples((n, true))); val f = med(samples((n, false)))
      s""""$n":{"pf_true":${r2(t)},"pf_false":${r2(f)},"ratio":${r2(f / t)}}"""
    }
    val totT = queries.map(n => med(samples((n, true)))).sum
    val totF = queries.map(n => med(samples((n, false)))).sum
    println(s"""{"study":"conf_parallelism_first","sf":"$sfDir",""" +
      s""""rounds":$rounds,"total_pf_true":${r2(totT)},""" +
      s""""total_pf_false":${r2(totF)},"ratio":${r2(totF / totT)},""" +
      s""""per_query":{${per.mkString(",")}}}""")
    spark.stop()
  }
}
