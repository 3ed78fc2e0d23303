package graft

import org.apache.spark.sql.SparkSession

/** Plan-review utility: prints the formatted physical plan of each
  * SparkEntry query (or those named in args) so pushdown, broadcast
  * and codegen coverage can be audited (SURVEY §5).
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try {
        val qe = SparkEntry.queries(n)(spark, sfDir).queryExecution
        // EXECUTE the plan first (toRdd.count — no driver row
        // collection), so the printout is the FINAL adaptive plan:
        // AQE's runtime exchange reuse (ReusedExchange/ReusedSubquery)
        // and coalesced stages are part of the plan that actually ran,
        // and the initial static plan over-counts duplicated subtrees
        // that never execute twice
        qe.toRdd.count()
        println(qe.explainString(org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
