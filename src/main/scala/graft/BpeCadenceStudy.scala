package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 verdict item #8: the BPE checkpoint cadence shipped in r15 as 4
  * without an A/B against the alternatives. Same-JVM sweep of cadence
  * ∈ {1, 2, 4, 6, 8, 12} on the shipped text_bpe_merges shape (12
  * rounds over the documents corpus); each cadence timed `rounds`
  * times, arm order rotated per round so no cadence always inherits
  * the previous arm's cleanup debt. The merge sequence is cadence-
  * invariant (BpeSpec pins it against the single-node trainer).
  */
object BpeCadenceStudy {
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
    def docs = graft.core.Tables.documents(spark, sfDir)
    val cadences = Seq(1, 2, 4, 6, 8, 12)
    def run(c: Int): Double = {
      val t0 = System.nanoTime()
      graft.ops.Bpe.trainMerges(docs, col("text"), rounds = 12, cadence = c)
        .write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      clearState()
      t
    }
    cadences.foreach(run) // warmup
    val samples = scala.collection.mutable.Map.empty[Int, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (0 until rounds).foreach { r =>
      val rotated = cadences.drop(r % cadences.size) ++
        cadences.take(r % cadences.size)
      rotated.foreach { c => samples(c) = samples(c) :+ run(c) }
    }
    def med(v: Vector[Double]): Double = v.sorted.apply(v.size / 2)
    def r2(x: Double) = math.round(x * 100.0) / 100.0
    println(s"""{"study":"bpe_cadence","sf":"$sfDir","rounds":$rounds,""" +
      cadences.map(c => s""""c$c":${r2(med(samples(c)))}""").mkString(",") +
      s""","samples":{${cadences.map(c => "\"c" + c + "\":[" +
        samples(c).map(r2).mkString(",") + "]").mkString(",")}}}""")
    spark.stop()
  }
}
