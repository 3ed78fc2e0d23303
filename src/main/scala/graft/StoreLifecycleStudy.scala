package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 optimization round: phase decomposition of the store
  * lifecycle bench rows (store_delete = write + delete + append +
  * open + full read). Times each phase separately, plus the Spark
  * job count per phase (from the status tracker), so optimization
  * effort lands on the phase that actually pays.
  *
  * Usage: runMain graft.StoreLifecycleStudy [sfDir] [rounds]
  */
object StoreLifecycleStudy {
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
    import graft.core.{IndexSpec, Store, Tables}
    val dir = "/tmp/graft_lifecycle_study"
    val dspec = IndexSpec(Seq("o_orderpriority"))
    val orders = Tables.orders(spark, sfDir)
    def jobs(): Int = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    def phase(name: String, acc: collection.mutable.Map[String, (Double, Int)])(f: => Unit): Unit = {
      val j0 = jobs(); val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9; val dj = jobs() - j0
      val (pt, pj) = acc.getOrElse(name, (0.0, 0))
      acc(name) = (pt + dt, pj + dj)
    }
    val acc = collection.mutable.LinkedHashMap.empty[String, (Double, Int)]
    // warm
    (0 to rounds).foreach { r =>
      val a = if (r == 0) collection.mutable.LinkedHashMap.empty[String, (Double, Int)] else acc
      new java.io.File(dir).delete()
      phase("write", a) { Store.write(orders, dir, dspec) }
      phase("delete", a) { Store.delete(spark, dir, dspec, "o_orderkey",
        orders.where(col("o_orderkey") % 7 === 0).select("o_orderkey")) }
      phase("append", a) { Store.append(
        orders.where(col("o_orderkey") % 21 === 0), dir, dspec) }
      phase("open", a) { Store.open(spark, dir, dspec) }
      phase("read", a) { Store.open(spark, dir, dspec).frame.df
        .select("o_orderkey", "o_orderpriority", "o_orderstatus")
        .orderBy("o_orderkey")
        .write.mode("overwrite").format("noop").save() }
      phase("index_read", a) { Store.open(spark, dir, dspec).persistedIndex
        .orderBy("field", "value")
        .write.mode("overwrite").format("noop").save() }
      spark.catalog.clearCache()
    }
    def r2(x: Double) = math.round(x / rounds * 100.0) / 100.0
    val per = acc.map { case (n, (t, j)) =>
      s""""$n":{"sec":${r2(t)},"jobs":${j / rounds}}""" }
    println(s"""{"study":"store_lifecycle","rounds":$rounds,""" +
      s""""phases":{${per.mkString(",")}}}""")
    spark.stop()
  }
}
