package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Round-10 operator evidence that the cross-engine hash gate cannot
  * carry: the FULL-graph connected-components entry (whose DuckDB
  * closure would be O(n²) — the reason the hash-oracled twin
  * subsamples) is pinned by the two properties that define a correct
  * component labeling, on the real corpus graph.
  */
class Round10Spec extends SparkSpec {

  test("domainCap: caps bind exactly, gate respected, md5-prefix kept") {
    val docs = Tables.documents(spark, sfDir)
    val gate = length(col("text")).between(100, 400)
    val cap = 15
    val got = graft.ops.Curation.domainCap(docs, col("source"),
      col("doc_id"), gate, cap).collect()
    // ground truth: per-source passing docs in md5 order
    val passing = docs.where(gate)
      .select(col("source"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(x => (x._3, x._2))).toMap
    // (1) survivor count per source = min(cap, n_passing) — the cap
    // binds exactly when it binds and never truncates below it
    val bySrc = got.groupBy(_.getString(0))
    assert(passing.keySet === bySrc.keySet)
    passing.foreach { case (src, ps) =>
      assert(bySrc(src).length === math.min(cap, ps.length), src)
      // (2) survivors are exactly the md5-order PREFIX of passing docs
      assert(bySrc(src).map(_.getLong(1)).sorted.toSeq ===
        ps.take(cap).map(_._2).sorted.toSeq, src)
      // (3) n_pass reports the source's true eligible count
      assert(bySrc(src).forall(_.getLong(3) == ps.length), src)
    }
    // both branches are exercised on this corpus
    assert(passing.values.exists(_.length > cap), "no source capped")
    assert(passing.values.exists(_.length < cap), "every source capped")
  }

  test("graph_components_full: labels edge-consistent and component-minimal") {
    val li = Tables.lineitem(spark, sfDir)
    val edges = li.as("la").join(li.as("lb"),
        col("la.l_orderkey") === col("lb.l_orderkey") &&
        col("la.l_partkey") < col("lb.l_partkey"))
      .groupBy(col("la.l_partkey").as("a"), col("lb.l_partkey").as("b"))
      .agg(count(lit(1)).as("sup"))
      .where(col("sup") >= 2)
      .select(col("a"), col("b"))
      .localCheckpoint()
    val labels = graft.ops.Dedup.clusters(edges)
      .select(col("id").cast("long").as("id"),
        col("label").cast("long").as("label"))
      .localCheckpoint()
    assert(labels.count() > 0)
    // (1) every edge's endpoints carry the SAME label — labels are a
    // valid coloring of the connectivity relation (no under-merge)
    val inconsistent = edges
      .join(labels.withColumnRenamed("id", "a")
        .withColumnRenamed("label", "la"), "a")
      .join(labels.withColumnRenamed("id", "b")
        .withColumnRenamed("label", "lb"), "b")
      .where(col("la") =!= col("lb")).count()
    assert(inconsistent === 0L)
    // (2) every label is the MIN id of its member set (the canonical
    // representative — no over-merge can fake this together with (1):
    // a spurious merge of two true components would leave the larger
    // min unreferenced as a label while its members point elsewhere,
    // failing the min check)
    val badMin = labels.groupBy("label").agg(min("id").as("m"))
      .where(col("label") =!= col("m")).count()
    assert(badMin === 0L)
    // (3) every labeled id is an edge endpoint and vice versa
    val nodes = edges.select(col("a").as("id"))
      .unionAll(edges.select(col("b").as("id"))).distinct()
    assert(labels.join(nodes, Seq("id"), "left_anti").count() === 0L)
    assert(nodes.join(labels, Seq("id"), "left_anti").count() === 0L)
  }
}
