package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch study: quantify what the Z-order layout actually buys —
  * rows READ off parquet (post row-group pruning, via task input
  * metrics) for the same 2-D range predicate against (a) the 1-D
  * sorted layout and (b) the Morton-interleaved layout
  * (core/Store.writeZOrdered), at a given SF. StoreSpec asserts the
  * bounding-box-halving property; this measures the read-time payoff
  * SURVEY §5 records. Two predicates:
  *   - box: range on BOTH keys (z-order should prune ~√-wise better)
  *   - b-only: range on the SECOND key only — the stripe layout's
  *     blind spot (every file spans the full b-domain, zero pruning)
  *
  * Usage: runMain graft.ZOrderStudy [sfDir]
  */
object ZOrderStudy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // one row group per ~1MB so file/row-group stats have
      // resolution at local SF (at cluster scale files are 128MB+
      // and the same geometry argument applies per row group)
      .config("spark.hadoop.parquet.block.size", (1 << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rowsRead = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          rowsRead.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    })

    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("a"), col("l_partkey").as("b"),
        col("l_quantity"))
    val (amax, bmax, n) = {
      val r = li.agg(max("a"), max("b"), count(lit(1))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val zDir = "/tmp/graft_zstudy_z"
    val sDir = "/tmp/graft_zstudy_s"
    graft.core.Store.writeZOrdered(li, zDir, col("a"), col("b"),
      numFiles = 64)
    li.repartitionByRange(64, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$sDir/data")

    def measure(label: String, dir: String, pred: org.apache.spark.sql.Column): Long = {
      val df = spark.read.parquet(s"$dir/data").where(pred)
      df.agg(count(lit(1)), sum("l_quantity"))
        .write.mode("overwrite").format("noop").save() // warm/plan
      rowsRead.set(0)
      val kept = df.count()
      val read = rowsRead.get()
      println(f"STUDY zorder $label%-28s kept=$kept%9d rows_read=$read%9d " +
        f"of n=$n (${read * 100.0 / n}%.1f%% scanned)")
      read
    }

    // 10% box on each dimension → ~1% of the plane
    val boxPred = col("a").between(amax / 2, amax / 2 + amax / 10) &&
      col("b").between(bmax / 2, bmax / 2 + bmax / 10)
    // second-dimension-only range — the 1-D layout's blind spot
    val bPred = col("b").between(bmax / 2, bmax / 2 + bmax / 10)

    val z1 = measure("zorder  box(a,b)", zDir, boxPred)
    val s1 = measure("sorted  box(a,b)", sDir, boxPred)
    val z2 = measure("zorder  b-only", zDir, bPred)
    val s2 = measure("sorted  b-only", sDir, bPred)
    println(f"STUDY zorder summary box=${s1.toDouble / z1}%.1fx fewer rows " +
      f"b_only=${s2.toDouble / z2}%.1fx fewer rows (sf=$sfDir)")
    spark.stop()
  }
}
