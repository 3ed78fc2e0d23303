package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** r16 measurement tool (guide §1/§7): run named SparkEntry queries
  * through the noop sink and print, per query, total wall, Spark JOB
  * count, stage count, and the top stages by wall-clock with their
  * first plan-line description — the local-mode substitute for the UI
  * stage page. sf0.1 rows are scheduling-floor-bound, so job/stage
  * counts are the actionable number here.
  *
  * Usage: runMain graft.QueryStageProbe sfDir reps q1 q2 ...
  */
object QueryStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, dur, si.taskMetrics.executorRunTime,
            si.name.linesIterator.take(1).mkString.take(80)))
        }
      }
    })
    def jobs(): Int =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    names.foreach { n => // warmup
      try SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"$n warmup FAILED: ${e.getMessage}") }
      clearState()
    }
    (1 to reps).foreach { r =>
      names.foreach { n =>
        stages.synchronized(stages.clear())
        val j0 = jobs()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val t = (System.nanoTime() - t0) / 1e9
        val dj = jobs() - j0
        Thread.sleep(250)
        val snap = stages.synchronized(stages.toVector)
        println(f"[$r] $n%-34s total=$t%6.2f s jobs=$dj%3d stages=${snap.size}%3d " +
          f"stageWallSum=${snap.map(_._2).sum / 1000.0}%6.2f s")
        snap.sortBy(-_._2).take(5).foreach { case (id, w, rr, nm) =>
          println(f"      stage $id%5d wall=${w / 1000.0}%5.2f run=${rr / 1000.0}%6.2f  $nm")
        }
        clearState()
      }
    }
    spark.stop()
  }
}
