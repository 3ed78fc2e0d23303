package graft

import graft.ops.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def scores = Seq(
    ("a", 1L, 0.9), ("a", 2L, 0.8), ("a", 3L, 0.95), ("a", 4L, 0.7),
    ("b", 5L, 0.5), ("b", 6L, 0.6),
    ("c", 7L, 0.1) // fewer rows than k
  ).toDF("g", "id", "score")

  private def native(k: Int) =
    TopK.perGroup(scores, Seq(col("g")), Seq(desc("score"), asc("id")), k)
      .select("g", "rnk", "id", "score")

  private def windowed(k: Int) = {
    val w = Window.partitionBy("g").orderBy(desc("score"), asc("id"))
    scores.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("g", "rnk", "id", "score")
  }

  test("native per-group top-k equals the window row_number spelling") {
    for (k <- Seq(1, 2, 3, 10)) {
      val n = native(k).collect().map(_.toString).sorted.toSeq
      val w = windowed(k).collect().map(_.toString).sorted.toSeq
      assert(n === w, s"k=$k")
    }
  }

  test("plan is partial heap -> exchange -> sorted streaming final; input never sorted") {
    val plan = native(3).queryExecution.executedPlan.toString
    val iFinal = plan.indexOf("TopKPerGroupFinal")
    val iPartial = plan.indexOf("TopKPerGroupPartial")
    assert(iFinal >= 0 && iPartial > iFinal, plan)
    // the whole point: the INPUT is never sorted — the only Sort in
    // the plan is the spillable one over the pruned partial winners,
    // i.e. between the final exec and the partial exec (tree order:
    // final > sort > exchange > partial). Nothing below the partial.
    val lower = plan.toLowerCase
    assert(lower.indexOf("sort ", iPartial) === -1, plan)
  }

  test("partial flush budget: tiny budget only adds shuffle rows, never wrong answers") {
    // budget of 8 retained rows with 100 groups forces many mid-stream
    // flushes in the partial phase; the final phase must still select
    // the exact per-group top-k
    spark.conf.set("graft.topk.partialBudgetRows", "8")
    try {
      val many = spark.range(2000)
        .select((col("id") % 100).cast("string").as("g"), col("id"),
          (col("id") * 37 % 1000).as("score"))
      val n = TopK.perGroup(many, Seq(col("g")), Seq(desc("score"), asc("id")), 3)
        .select("g", "rnk", "id").collect().map(_.toString).sorted.toSeq
      val w = {
        val win = Window.partitionBy("g").orderBy(desc("score"), asc("id"))
        many.withColumn("rnk", row_number().over(win).cast("long"))
          .where(col("rnk") <= 3).select("g", "rnk", "id")
          .collect().map(_.toString).sorted.toSeq
      }
      assert(n === w)
    } finally spark.conf.unset("graft.topk.partialBudgetRows")
  }

  test("partial phase bounds rows shuffled per (group, partition) to k") {
    // 1000 rows in one group, k=5: after the partial phase at most
    // k rows per input partition survive to the exchange
    val big = spark.range(1000)
      .select(lit("g").as("g"), col("id"), rand(7).as("score"))
      .repartition(4)
    val topk = TopK.perGroup(big, Seq(col("g")), Seq(desc("score")), 5)
    assert(topk.count() === 5)
    // agreement with the sort-based answer on a deterministic column
    val viaSort = big.orderBy(desc("score")).limit(5)
      .select(sum("id")).head().getLong(0)
    val viaHeap = topk.select(sum("id")).head().getLong(0)
    assert(viaHeap === viaSort)
  }

  test("null sort keys and ties rank identically to the window spelling") {
    val messy = Seq[(String, java.lang.Long, java.lang.Double)](
      ("a", 1L, 0.5), ("a", 2L, null), ("a", 3L, 0.5), ("a", 4L, 0.9),
      ("b", 5L, null), ("b", 6L, null)
    ).toDF("g", "id", "score")
    val n = TopK.perGroup(messy, Seq(col("g")), Seq(desc("score"), asc("id")), 2)
      .select("g", "rnk", "id").collect().map(_.toString).sorted.toSeq
    val w = {
      val win = Window.partitionBy("g").orderBy(desc("score"), asc("id"))
      messy.withColumn("rnk", row_number().over(win).cast("long"))
        .where(col("rnk") <= 2).select("g", "rnk", "id")
        .collect().map(_.toString).sorted.toSeq
    }
    assert(n === w) // desc => NULLS LAST, ties broken by id — identical
  }

  test("matches the ann brute-force query shape on real embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val scored = graft.ops.Similarity.bruteTopK(
      emb, emb.where(col("vec_id") < 10), 5)
    val viaNative = {
      import graft.functions.VecMath.{vecDot, vecNorm}
      val c = emb.select(col("vec_id"), col("embedding"), vecNorm(col("embedding")).as("cn"))
      val q = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          vecNorm(col("embedding")).as("qn"))
      val s = c.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nbr"),
          round(vecDot(col("qv"), col("embedding")) / (col("qn") * col("cn")), 6).as("cos"))
      TopK.perGroup(s, Seq(col("qid")), Seq(desc("cos"), asc("nbr")), 5)
        .select("qid", "nbr", "cos", "rnk")
    }
    val a = scored.select("qid", "nbr", "cos", "rnk")
      .collect().map(_.toString).sorted.toSeq
    val b = viaNative.collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
