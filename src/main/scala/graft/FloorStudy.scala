package graft

import org.apache.spark.sql.SparkSession

/** r15 optimization round, guide §1: decompose the per-query FIXED
  * cost that every one of the 200 bench rows pays — DataFrame
  * construction + analysis/optimization (driver-side Catalyst),
  * versus execution (jobs/stages). If the floor is planning-bound,
  * expression-tree simplification pays across the suite; if it is
  * stage-scheduling-bound, shuffle-count reduction pays.
  *
  * Usage: runMain graft.FloorStudy [sfDir] [rounds]
  */
object FloorStudy {
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
    val queries = Seq("q1_agg", "point_lookup", "df_scan", "window_rank",
      "events_window", "dedup_exact", "text_entropy", "q5_join")
    def phases(name: String): (Double, Double, Double) = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir) // build (may run jobs)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t2 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save() // execute
      val t3 = System.nanoTime()
      clearState()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
    }
    queries.foreach(phases) // warm
    val acc = scala.collection.mutable.Map
      .empty[String, (Double, Double, Double)].withDefaultValue((0, 0, 0))
    (1 to rounds).foreach { _ =>
      queries.foreach { n =>
        val (a, b, c) = phases(n)
        val (pa, pb, pc) = acc(n); acc(n) = (pa + a, pb + b, pc + c)
      }
    }
    def r3(x: Double) = math.round(x / rounds * 1000.0) / 1000.0
    val per = queries.map { n =>
      val (a, b, c) = acc(n)
      s""""$n":{"build":${r3(a)},"plan":${r3(b)},"exec":${r3(c)}}"""
    }
    println(s"""{"study":"floor","sf":"$sfDir","rounds":$rounds,""" +
      s""""mean_per_query":{${per.mkString(",")}}}""")
    spark.stop()
  }
}
