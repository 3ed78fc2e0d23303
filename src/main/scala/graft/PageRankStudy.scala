package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch study: per-round wall time of the convergence-gated
  * PageRank at 20 iterations — the checkpoint-cadence claim
  * (Graph.scala's "at cluster scale the rank table would be
  * checkpointed every few iterations") measured rather than asserted.
  * A flat per-round series at cadence 1 (vs the growing recompute
  * sawtooth a long cadence admits, and the unbounded growth no
  * checkpoint at all would show) is the evidence SURVEY §5 records.
  *
  * Usage: runMain graft.PageRankStudy [sfDir] — default the 3× set.
  */
object PageRankStudy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf03")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = graft.core.Tables.orders(spark, sfDir)
      .join(graft.core.Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("a"),
        concat(lit("s"), col("l_suppkey")).as("b"))
      .distinct()

    // instrumented copy of pageRankConverged's loop (same prStep via
    // the public fixed-iteration op run 1 round at a time would NOT
    // reproduce the lineage question — the whole point is the chain)
    def study(label: String, checkpointEvery: Int, rounds: Int): Unit = {
      val dir0 = edges.select(col("a").as("src"), col("b").as("dst"))
      val e2 = dir0.unionAll(dir0.select(col("dst").as("src"),
        col("src").as("dst"))).distinct()
      val deg = e2.groupBy("src").agg(count(lit(1)).as("deg"))
      val edgesDeg = e2.join(deg, "src")
        .select(col("src"), col("dst"), col("deg")).localCheckpoint()
      var ranks = deg.select(col("src").as("node"),
        lit(1000000L).as("rank_micro")).localCheckpoint()
      val times = (1 to rounds).map { it =>
        val t0 = System.nanoTime()
        var next = edgesDeg.join(ranks, edgesDeg("src") === ranks("node"))
          .select(col("dst"),
            expr("((rank_micro * 85) div (deg * 100))").as("contrib"))
          .groupBy("dst")
          .agg((lit(150000L) + sum("contrib")).as("rank_micro"))
          .select(col("dst").as("node"), col("rank_micro"))
        if (checkpointEvery > 0 && it % checkpointEvery == 0)
          next = next.localCheckpoint()
        val delta = next.as("n")
          .join(ranks.as("p"), col("n.node") === col("p.node"))
          .agg(coalesce(max(abs(col("n.rank_micro") - col("p.rank_micro"))),
            lit(0L))).head().getLong(0)
        ranks = next
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, delta)
      }
      val ts = times.map(_._1)
      println(f"STUDY pagerank cadence=$label%-6s rounds=$rounds " +
        f"r1=${ts.head}%.2f r5=${ts(4)}%.2f r10=${ts(9)}%.2f " +
        f"r15=${ts(14)}%.2f r20=${ts(19)}%.2f total=${ts.sum}%.1f s " +
        s"final_delta=${times.last._2}")
    }

    // the r11 FUSED round (what pageRankConverged now ships): prev
    // rank carried through the round's join, lazy checkpoint mark,
    // the delta aggregate is the round's ONE action — vs study()'s
    // two-action shape (checkpoint materialization THEN a separate
    // probe join job over the checkpointed tables)
    def studyFused(rounds: Int): Unit = {
      val dir0 = edges.select(col("a").as("src"), col("b").as("dst"))
      val e2 = dir0.unionAll(dir0.select(col("dst").as("src"),
        col("src").as("dst"))).distinct()
      val deg = e2.groupBy("src").agg(count(lit(1)).as("deg"))
      val edgesDeg = e2.join(deg, "src")
        .select(col("src"), col("dst"), col("deg")).localCheckpoint()
      var ranks = deg.select(col("src").as("node"),
        lit(1000000L).as("rank_micro")).localCheckpoint()
      val times = (1 to rounds).map { _ =>
        val t0 = System.nanoTime()
        val next = edgesDeg.join(ranks, edgesDeg("src") === ranks("node"))
          .select(col("dst"),
            expr("((rank_micro * 85) div (deg * 100))").as("contrib"))
          .groupBy("dst")
          .agg((lit(150000L) + sum("contrib")).as("rank_micro"))
          .select(col("dst").as("node"), col("rank_micro"))
          .join(ranks.select(col("node"),
            col("rank_micro").as("prev_micro")), "node")
          .localCheckpoint(false)
        val delta = next
          .agg(coalesce(max(abs(col("rank_micro") - col("prev_micro"))),
            lit(0L))).head().getLong(0)
        ranks = next.select("node", "rank_micro")
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, delta)
      }
      val ts = times.map(_._1)
      println(f"STUDY pagerank fused rounds=$rounds " +
        f"r1=${ts.head}%.2f r5=${ts(4)}%.2f r10=${ts(9)}%.2f " +
        f"r15=${ts(14)}%.2f r20=${ts(19)}%.2f total=${ts.sum}%.1f s " +
        s"final_delta=${times.last._2}")
    }

    study("1", 1, 20)
    study("5", 5, 20)
    studyFused(20)
    spark.stop()
  }
}
