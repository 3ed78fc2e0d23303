package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 diagnostic #2: ScrubProbe showed the scrub final PROJECTION is
  * ~free in both spellings, yet the full native query reads ~2.4× the
  * v1 full query in KernelStudy. Plans are shape-identical, so the
  * difference must be stage-level (compile? schedule? one slow stage).
  * Run each full query alternately with a stage listener and print
  * per-stage wall-clock so the slow stage names itself.
  */
object ScrubStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, dur, si.taskMetrics.executorRunTime))
        }
      }
    })

    def docs = graft.ops.Dedup.plantSpanDups(
      graft.core.Tables.documents(spark, sfDir))
    def runArm(name: String, native: Boolean): Unit = {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      graft.ops.Dedup.exactSubstrScrub(docs, col("text"), col("doc_id"),
          nativeKernel = native)
        .write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      val (n, wall, run) = stages.synchronized {
        (stages.size, stages.map(_._2).sum, stages.map(_._3).sum)
      }
      println(f"$name%10s total=$t%6.2f s  stages=$n  " +
        f"stageWallSum=${wall / 1000.0}%7.2f s  execRunSum=${run / 1000.0}%7.2f s")
      val top = stages.synchronized(stages.sortBy(-_._2).take(6).toVector)
      top.foreach { case (id, w, r) =>
        println(f"    stage $id%4d wall=${w / 1000.0}%6.2f s run=${r / 1000.0}%6.2f s")
      }
    }
    // warmup both
    runArm("warm_nat", native = true)
    runArm("warm_v1", native = false)
    (1 to rounds).foreach { _ =>
      runArm("native", native = true)
      runArm("v1", native = false)
    }
    spark.stop()
  }
}
