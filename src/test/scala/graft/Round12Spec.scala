package graft

import org.apache.spark.sql.functions._

/** r12 items: VecUnit null-element semantics (r11 advice), plus the
  * round's plan-shape assertions (added as the items land).
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  test("vec_unit: null elements propagate as null, never as wrong values") {
    val df = Seq(
      (1L, Seq[java.lang.Float](3.0f, 4.0f)),
      (2L, Seq[java.lang.Float](1.0f, null, 2.0f)),
      (3L, Seq[java.lang.Float](null, null)),
      (4L, Seq.empty[java.lang.Float])
    ).toDF("id", "v")
    // input is nullable-element (the parquet embeddings shape)
    assert(df.schema("v").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    // the staged spelling vec_unit documents itself bit-identical to:
    // null elements contribute 0 to the norm and stay null
    val acc = (a: org.apache.spark.sql.Column,
               x: org.apache.spark.sql.Column) =>
      a + coalesce(x.cast("double"), lit(0.0)) *
        coalesce(x.cast("double"), lit(0.0))
    val nrm = greatest(
      sqrt(aggregate(col("v"), lit(0.0), acc)), lit(1e-30))
    val rows = df.select(col("id"),
        graft.functions.VecMath.vecUnit(col("v")).as("fast"),
        transform(col("v"), x => (x.cast("double") / nrm).cast("float"))
          .as("staged"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.getSeq[java.lang.Float](1) === r.getSeq[java.lang.Float](2),
        s"id=${r.getLong(0)}")
    }
    // null-free vectors keep exact values (3-4-5 triangle)
    assert(rows(0).getSeq[java.lang.Float](1) === Seq(0.6f, 0.8f))
    // nulls stayed null; non-null elements normalized by the
    // nulls-as-zero norm
    assert(rows(1).getSeq[java.lang.Float](1)(1) === null)
  }

  test("graph_pagerank steady state: only the persisted edge artifact is scanned — never orders/lineitem") {
    // first invocation builds the snapshot-keyed artifact; the frame
    // it RETURNS iterates from the artifact read, so its plan must
    // name pr_edges and neither fact table (r11 verdict #5)
    val out = graft.queries.Analytics.queries("graph_pagerank")(spark, sfDir)
    val scans = out.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Location")).mkString("\n")
    assert(scans.contains("pr_edges_full_"), scans)
    assert(!scans.contains("orders.parquet"), scans)
    assert(!scans.contains("lineitem.parquet"), scans)
    // and the artifact is build-once: a second open must not rebuild
    val key = graft.core.Artifacts.tableSnapshotKey(spark,
        s"$sfDir/orders.parquet") +
      graft.core.Artifacts.tableSnapshotKey(spark, s"$sfDir/lineitem.parquet")
    val dir = s"${graft.core.Artifacts.datasetCacheDir(sfDir)}/pr_edges_full_$key"
    val served = graft.core.Artifacts.haveParquet(spark, dir) {
      fail("artifact rebuilt despite being fresh"); null
    }
    assert(served.columns.toSeq === Seq("src", "dst", "deg"))
  }

  test("customer_rfm melt: one fused rank layout yields the same quintiles as three chained ranks") {
    import graft.core.Tables
    // independent ground truth: the pre-r12 chained spelling, built
    // here from first principles
    val per = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("monetary"))
    val mx = per.agg(max("last_day").as("mx"), count(lit(1)).as("n_cust"))
    val base = per.crossJoin(broadcast(mx))
      .select(col("custkey"),
        datediff(col("mx"), col("last_day")).cast("long").as("recency_days"),
        col("frequency"), col("monetary"), col("n_cust"))
    val chained = Seq[(String, Seq[org.apache.spark.sql.Column])](
      "rnk_r" -> Seq(asc("recency_days"), asc("custkey")),
      "rnk_f" -> Seq(desc("frequency"), asc("custkey")),
      "rnk_m" -> Seq(desc("monetary"), asc("custkey"))
    ).foldLeft(base) { case (df, (name, sort)) =>
      graft.ops.Rank.globalRank(df, sort, name)
    }.select(col("custkey"),
        expr("(rnk_r - 1) * 5 div n_cust + 1").as("r_score"),
        expr("(rnk_f - 1) * 5 div n_cust + 1").as("f_score"),
        expr("(rnk_m - 1) * 5 div n_cust + 1").as("m_score"))
      .orderBy("custkey").collect().toSeq
    val fused = graft.queries.Analytics.queries("customer_rfm")(spark, sfDir)
      .select("custkey", "r_score", "f_score", "m_score")
      .orderBy("custkey").collect().toSeq
    assert(fused === chained)
  }
}
