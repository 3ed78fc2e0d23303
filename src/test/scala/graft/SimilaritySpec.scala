package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("cosine of a vector with itself is 1") {
    val df = Seq((1L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val c = df.select(Similarity.cosine(col("embedding"), col("embedding"))).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("brute top-k returns k sorted neighbors per query") {
    val res = Similarity.bruteTopK(emb, emb.where(col("vec_id") < 3), k = 4)
      .select("qid", "rnk", "cos").collect()
    assert(res.length === 12)
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cs = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      assert(cs.sorted.reverse.sameElements(cs)) // descending
    }
  }

  test("lsh top-1 mostly agrees with brute top-1") {
    val q = emb.where(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(emb, q, 1)
      .select("qid", "nbr").as[(Long, Long)].collect().toMap
    val lsh = Similarity.lshTopK(emb, q, 1)
      .select("qid", "nbr").as[(Long, Long)].collect().toMap
    // approximate: top-1 agreement on a majority of queries is the
    // recall bar for the bucketed path at these sizes
    val hits = brute.count { case (k, v) => lsh.get(k).contains(v) }
    assert(hits >= brute.size / 2, s"$hits/${brute.size} top-1 agreement")
  }

  test("ivf top-1 recall beats random-subset expectation") {
    val q = emb.where(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(emb, q, 1)
      .select("qid", "nbr").as[(Long, Long)].collect().toMap
    val ivf = Similarity.ivfTopK(emb, q, 1, nlist = 8, nprobe = 4)
      .select("qid", "nbr").as[(Long, Long)].collect().toMap
    // probing half the lists should recover well over half the top-1s
    val hits = brute.count { case (k, v) => ivf.get(k).contains(v) }
    assert(hits >= brute.size / 2, s"$hits/${brute.size} ivf top-1 agreement")
  }

  test("hyperplane signature is deterministic") {
    val s1 = emb.select(Similarity.hyperplaneSig(col("embedding"), 64, 16)).collect()
    val s2 = emb.select(Similarity.hyperplaneSig(col("embedding"), 64, 16)).collect()
    assert(s1.map(_.getLong(0)).sameElements(s2.map(_.getLong(0))))
  }
}
