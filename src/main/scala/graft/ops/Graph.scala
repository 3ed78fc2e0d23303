package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relational edge lists — the
  * "derive a graph from the warehouse, rank its nodes" workload
  * (reference analog: the co-occurrence/knn weight graphs of
  * ml/Knn.scala:45-111, which rank related items; here the ranking is
  * global and iterative instead of per-query).
  *
  * PageRank is computed in EXACT integer micro-units so the result is
  * reproducible across engines (the repo's micro-ln protocol, SURVEY
  * §6): ranks are longs scaled by 1e6, each edge contribution is the
  * floored integer division (rank * damping_num) div (damping_den *
  * out_degree), and the per-iteration update is
  * rank'(v) = base + Σ_incoming contrib. No floating point anywhere,
  * so a DuckDB mirror unrolled per iteration hashes identically.
  *
  * Scale shape (100 TB): the edge list with attached out-degree is
  * built ONCE (one groupBy + one join) and cached; each iteration is
  * one equi-join of the (node, rank) table to the edge list plus one
  * map-side-combinable aggregation on dst — the standard distributed
  * PageRank plan. Iterations are a fixed small count (default 5), so
  * the lineage stays bounded; at cluster scale the rank table would
  * be checkpointed every few iterations (here it is 2 columns ×
  * n_nodes, tiny relative to edges). No driver-side state: the loop
  * is driver-orchestrated but all data stays distributed.
  */
object Graph {

  /** PageRank over an undirected edge list `(a, b)` (each undirected
    * edge contributes both directions). Returns (node, rank_micro)
    * with base = (1 - d) * 1e6 and d = dampNum/dampDen (default
    * 85/100). Every node in the edge list has degree ≥ 1, so no
    * dangling-node term is needed.
    */
  def pageRank(edgesUndirected: DataFrame, a: Column, b: Column,
               iterations: Int = 5,
               dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1 && dampNum > 0 && dampDen >= dampNum)
    val base = (dampDen - dampNum) * 1000000L / dampDen
    val dir = edgesUndirected.select(a.as("src"), b.as("dst"))
    val edges = dir.unionAll(dir.select(col("dst").as("src"),
      col("src").as("dst"))).distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // edge list with the source's out-degree attached — built once,
    // reused by every iteration. localCheckpoint, not persist():
    // its blocks are owned by the RDD and GC-reclaimed by the
    // ContextCleaner (the Bpe/clusters hygiene contract,
    // CacheHygieneSpec) — no CacheManager entry for a long-lived
    // session to leak; it also truncates the per-iteration lineage.
    val edgesDeg = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("deg")).localCheckpoint()
    val ranks0 = deg.select(col("src").as("node"),
      lit(1000000L).as("rank_micro"))
    val result = (1 to iterations).foldLeft(ranks0) { (ranks, _) =>
      edgesDeg.join(ranks, edgesDeg("src") === ranks("node"))
        .select(col("dst"),
          expr(s"((rank_micro * $dampNum) div (deg * $dampDen))")
            .as("contrib"))
        .groupBy("dst")
        .agg((lit(base) + sum("contrib")).as("rank_micro"))
        .select(col("dst").as("node"), col("rank_micro"))
    }
    result.orderBy("node")
  }
}
