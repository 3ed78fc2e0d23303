package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch study: per-task max time of the hot-key cap spellings */
object SkewStudy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null)
          maxTask.getAndUpdate(m => math.max(m, t.taskInfo.duration))
    })

    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    // planted mega-hot key: N identical docs -> one (band,bucket) blob
    val n = args.headOption.map(_.toLong).getOrElse(300000L)
    val blob = spark.range(n)
      .select((col("id") + 10000000L).as("doc_id"),
        lit("common boilerplate text that repeats verbatim across the " +
          "whole corpus many many times over and over again").as("text"))
    val corpus = docs.unionByName(blob).localCheckpoint(true)

    def run(label: String, impl: String): Unit = {
      spark.conf.set(graft.ops.Skew.CapImplConf, impl)
      // warm
      graft.ops.Dedup.minhashLsh(corpus.limit(100), col("text"), col("doc_id"))
        .write.mode("overwrite").format("noop").save()
      maxTask.set(0)
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.minhashLsh(corpus, col("text"), col("doc_id"))
      out.write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"STUDY $label%-8s wall=$wall%.2f s  max_task=${maxTask.get / 1000.0}%.2f s")
    }
    run("exchange", "exchange")
    run("grouped", "grouped")
    run("window", "window")
    run("exchange", "exchange")
    run("grouped", "grouped")
    run("window", "window")
    spark.stop()
  }
}
