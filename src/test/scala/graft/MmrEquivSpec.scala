package graft

import org.apache.spark.sql.functions._
import graft.ops.Search

/** r15 optimization round: `Search.mmrTopK`'s post-shortlist tail
  * (pair table + k greedy join rounds) was collapsed into per-query
  * array math. The scoring protocol (6dp cosines, 0.5·rel − 0.5·max
  * sim, argmax tie → smaller id) is unchanged, so the selection
  * sequences must agree exactly — pinned here against the retained
  * v1 spelling on live data across k/shortlist shapes, including a
  * shortlist that exhausts before k picks (the former per-step join
  * just stopped producing rows). The DuckDB mirror additionally
  * hash-gates the shipped query.
  */
class MmrEquivSpec extends SparkSpec {

  private def emb = graft.core.Tables.embeddings(spark, sfDir)

  private def run(k: Int, shortlist: Int, nq: Int) = {
    val q = emb.where(col("vec_id") < nq)
    val v2 = Search.mmrTopK(emb, col("embedding"), col("vec_id"),
      q, k, shortlist).collect().toSeq
    val v1 = Search.mmrTopKV1(emb, col("embedding"), col("vec_id"),
      q, k, shortlist).collect().toSeq
    assert(v2 == v1, s"k=$k shortlist=$shortlist nq=$nq")
  }

  test("array tail equals v1 at the shipped shape (k=5, C=20)") {
    run(k = 5, shortlist = 20, nq = 10)
  }

  test("array tail equals v1 at k=1 and at k=shortlist") {
    run(k = 1, shortlist = 4, nq = 5)
    run(k = 3, shortlist = 3, nq = 5)
  }

  test("array tail equals v1 when the shortlist exhausts early") {
    // corpus of 4 vectors, queries among them: each query has only 3
    // candidates, so k=3 with shortlist=3 exhausts exactly and any
    // larger corpus subset exercises the absent-pick branch
    val tiny = emb.where(col("vec_id") < 4)
    val q = tiny.where(col("vec_id") < 2)
    val v2 = Search.mmrTopK(tiny, col("embedding"), col("vec_id"),
      q, 3, 3).collect().toSeq
    val v1 = Search.mmrTopKV1(tiny, col("embedding"), col("vec_id"),
      q, 3, 3).collect().toSeq
    assert(v2 == v1)
  }
}
