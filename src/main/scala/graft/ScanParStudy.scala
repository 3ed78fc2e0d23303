package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 optimization round, guide §2.5 "input skew — one huge
  * unsplittable file: repartition immediately after the read": the
  * test tables are single-row-group parquet, so EVERY query's map
  * stage runs one task regardless of cores. Same-JVM A/B: three
  * representative shapes (plain agg / heavy shingle explode+join /
  * heavy text scoring) with and without a post-read round-robin
  * repartition(cores).
  *
  * Usage: runMain graft.ScanParStudy [sfDir] [rounds]
  */
object ScanParStudy {
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
    import org.apache.spark.sql.DataFrame
    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      clearState(); t
    }
    val n = cpus.toInt
    def li(par: Boolean) = {
      val t = graft.core.Tables.lineitem(spark, sfDir)
      if (par) t.repartition(n) else t
    }
    def docs(par: Boolean) = {
      val t = graft.core.Tables.documents(spark, sfDir)
      if (par) t.repartition(n) else t
    }
    val arms: Seq[(String, Boolean => DataFrame)] = Seq(
      "q1_shape" -> (p => li(p)
        .where(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice"),
          avg("l_discount"), count(lit(1)))
        .orderBy("l_returnflag", "l_linestatus")),
      "ngram_shape" -> (p => graft.ops.Dedup.ngramJaccard(
        docs(p), col("text"), col("doc_id"))),
      "entropy_shape" -> (p => graft.ops.TextAnalysis.tokenEntropy(
        docs(p), col("text"), col("doc_id"))))
    arms.foreach { case (_, f) => time(f(false)); time(f(true)) }
    val acc = scala.collection.mutable.Map
      .empty[(String, Boolean), Vector[Double]].withDefaultValue(Vector.empty)
    (1 to rounds).foreach { _ =>
      arms.foreach { case (nm, f) =>
        Seq(false, true).foreach { p => acc((nm, p)) = acc((nm, p)) :+ time(f(p)) }
      }
    }
    def med(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    def r2(x: Double) = math.round(x * 100.0) / 100.0
    val per = arms.map { case (nm, _) =>
      val base = med(acc((nm, false))); val par = med(acc((nm, true)))
      s""""$nm":{"plain":${r2(base)},"repart":${r2(par)},"ratio":${r2(par / base)}}"""
    }
    println(s"""{"study":"scan_par","sf":"$sfDir","cpus":$n,""" +
      s""""rounds":$rounds,"per":{${per.mkString(",")}}}""")
    spark.stop()
  }
}
