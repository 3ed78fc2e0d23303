package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** The distributed BPE trainer must reproduce the single-node
  * reference trainer merge-for-merge (pair, rank AND weighted count),
  * including the left-to-right non-overlap subtlety and the
  * deterministic tie-break.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked merges on the classic low/lower corpus") {
    // weighted corpus: "low" x3, "lower" x2 — first merge must be
    // (l,o) with weight 5, second (lo,w) with weight 5
    val corpus = Seq.fill(3)("low").mkString(" ") + " " +
      Seq.fill(2)("lower").mkString(" ")
    val got = Bpe.trainMerges(Seq(corpus).toDF("text"), col("text"), 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got.take(2) === Seq((1L, "l", "o", 5L), (2L, "lo", "w", 5L)))
  }

  test("non-overlapping merge: aaa yields aa+a, not aa+aa") {
    val got = Bpe.trainMerges(Seq("aaa aaa").toDF("text"), col("text"), 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    // round 1: pairs (a,a) appear 2x per word (overlapping count) ->
    // merge (a,a); each word becomes [aa, a]; round 2 merges (aa, a)
    assert(got === Seq((1L, "a", "a", 4L), (2L, "aa", "a", 2L)))
  }

  test("distributed trainer equals the single-node reference on real docs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").limit(120)
    val texts = docs.collect().map(_.getString(0)).toSeq
    val expect = Bpe.trainMergesLocal(texts, 12)
    val got = Bpe.trainMerges(texts.toDF("text"), col("text"), 12)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got === expect)
  }
}
