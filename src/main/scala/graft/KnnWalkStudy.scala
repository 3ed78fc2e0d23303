package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{IndexSpec, Store}

/** scratch profile for knnPoint's 697 ms at 600k rows: how much is
  * stream DECODE (drain all weighted entries' key streams) vs the
  * ACCUMULATE (HashMap merge) vs the ROUND+SORT tail. Informs whether
  * a specialized accumulator is worth its lines.
  */
object KnnWalkStudy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = "/tmp/graft_knnwalk"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .withColumn("li_key", monotonically_increasing_id())
    val spec = IndexSpec(Seq("l_returnflag", "l_linestatus"))
      .withRowRefs("li_key")
    graft.core.Artifacts.haveStore(spark, s"$out/store") { d =>
      Store.write(li, d, spec)
    }
    val st = Store.open(spark, s"$out/store", spec)
    val w = {
      val kw = graft.ops.Knn.keyValueWeights(li,
        Seq("l_returnflag", "l_linestatus"), col("l_quantity") > 25)
      kw.coalesce(1).write.mode("overwrite").parquet(s"$out/w")
      Store.readWeightsDriver(spark, s"$out/w")
    }
    val q = Map("l_returnflag" -> "R", "l_linestatus" -> "F")
    def bestOf(n: Int)(f: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.min
    // (a) pure stream drain of every weighted entry
    val p = st.point.get
    val drain = bestOf(3) {
      var c = 0L
      w.foreach { case (f, v, _, _) =>
        p.rowStreams(f, v).foreach(_.foreach(_.foreach { _ => c += 1 }))
      }
      require(c > 0)
    }
    // (b) drain + HashMap accumulate (no round/sort)
    val acc = bestOf(3) {
      val m = new java.util.HashMap[Any, Double](1 << 21)
      w.foreach { case (f, v, w1, w2) =>
        val delta = if (q.get(f).contains(v)) -w2 else w1
        p.rowStreams(f, v).foreach(_.foreach(_.foreach { k =>
          m.merge(k, delta, (x, y) => x + y)
        }))
      }
      require(m.size > 0)
    }
    // (c) the full op
    val full = bestOf(3) { require(st.knnPoint(w, q, 10).isDefined) }
    println(s"""{"study":"knn_walk","drain_ms":${drain.round},""" +
      s""""drain_plus_acc_ms":${acc.round},"full_ms":${full.round}}""")
    spark.stop()
  }
}
