package graft
import org.apache.spark.sql.SparkSession

/** Fast pre-driver gate: force analysis (not execution) of every
  * SparkEntry query against live testdata and exit nonzero on any
  * failure. Catches loader/schema drift (the r6 `events.ts` class of
  * bug) in seconds, before a 20-minute Verify/Bench run — an analysis
  * exception here means the query would be silently absent from the
  * driver's correctness artifact.
  */
object SelfCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val failed = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).queryExecution.analyzed; None }
        catch { case e: Throwable =>
          System.err.println(s"[selfcheck] $name FAILED: ${e.getMessage}")
          Some(name)
        }
    }
    val missingOracle = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    if (missingOracle.nonEmpty)
      System.err.println(s"[selfcheck] oracleSql keys with no query: ${missingOracle.mkString(", ")}")
    println(s"[selfcheck] ${SparkEntry.queries.size - failed.size}/${SparkEntry.queries.size} queries analyze OK on $sfDir")
    spark.stop()
    if (failed.nonEmpty || missingOracle.nonEmpty) sys.exit(2)
  }
}
