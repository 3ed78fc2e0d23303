package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Dedup

// temporary diagnostic: stage timing for dedup_simhash at sf0.1
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    var t0 = System.nanoTime
    val pairs = Dedup.simhashPairs(docs, col("text"), col("doc_id"))
    val np = pairs.count()
    println(f"PROBE PAIRS: $np rows in ${(System.nanoTime - t0) / 1e9}%.1f s")

    t0 = System.nanoTime
    val cached = pairs.persist()
    cached.count()
    println(f"PROBE PAIRS-CACHE: ${(System.nanoTime - t0) / 1e9}%.1f s")

    t0 = System.nanoTime
    val cl = Dedup.clusters(cached)
    val nc = cl.count()
    println(f"PROBE CC: $nc labels in ${(System.nanoTime - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
