package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch study: per-task max time of the asof window under a
  * planted mega-hot key — plain partitionBy(key) vs the bucketTicks
  * skew guard (AsOf.scala). Feeds the SURVEY §5 numbers.
  */
object AsOfSkewStudy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null)
          maxTask.getAndUpdate(m => math.max(m, t.taskInfo.duration))
    })

    // one entity owns nHot of the left rows (think: one instrument
    // with 2M ticks); the rest spread over 50k keys. Times span ~1
    // year in micros.
    val nHot = args.headOption.map(_.toLong).getOrElse(2000000L)
    val year = 365L * 86400 * 1000000
    val lefts = spark.range(nHot)
      .select(lit("hot").as("k"), (col("id") * (year / nHot)).as("t"),
        col("id").as("lid"))
      .unionByName(spark.range(nHot / 2)
        .select(concat(lit("k"), col("id") % 50000).as("k"),
          (col("id") * 7919 % year).as("t"), (col("id") + nHot).as("lid")))
      .localCheckpoint(true)
    val rights = spark.range(nHot / 10)
      .select(lit("hot").as("k"), (col("id") * (year / (nHot / 10)) + 13).as("rt"),
        col("id").cast("double").as("v"))
      .unionByName(spark.range(nHot / 20)
        .select(concat(lit("k"), col("id") % 50000).as("k"),
          (col("id") * 104729 % year).as("rt"), col("id").cast("double").as("v")))
      .localCheckpoint(true)

    def run(label: String, bucket: Option[Long]): Unit = {
      maxTask.set(0)
      val t0 = System.nanoTime()
      graft.ops.AsOf.join(lefts, col("k"), col("t"),
          rights, col("k"), col("rt"), Seq("v" -> col("v")),
          bucketTicks = bucket)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"STUDY $label%-14s wall=$wall%.2f s  max_task=${maxTask.get / 1000.0}%.2f s")
    }
    val day = 86400L * 1000000
    // warm the IO paths once
    run("warm", None)
    for (_ <- 1 to 2) {
      run("plain", None)
      run("bucket-30d", Some(30 * day))
      run("bucket-7d", Some(7 * day))
      run("bucket-1d", Some(day))
    }
    spark.stop()
  }
}
