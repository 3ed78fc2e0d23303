package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (3L, "completely different text with other words entirely here now"),
    (4L, "spark makes distributed dataframes scale to very large clusters")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val g = Dedup.exact(docs, col("text"), col("doc_id")).collect()
    assert(g.length === 4) // 0 and 2 collapse
    val dup = g.find(_.getLong(1) == 2).get
    assert(dup.getLong(2) === 0L) // keep min id
  }

  test("ngram jaccard finds near-dups, not unrelated docs") {
    val pairs = Dedup.ngramJaccard(docs, col("text"), col("doc_id"), minJaccard = 0.3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L))) // exact dup: jaccard 1
    assert(pairs.contains((0L, 1L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH agrees with exact jaccard on real corpus") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = Dedup.ngramJaccard(corpus, col("text"), col("doc_id"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    val approx = Dedup.minhashLsh(corpus, col("text"), col("doc_id"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    // high-similarity pairs (θ=0.5 on both) should agree almost fully
    val recall = (exact & approx).size.toDouble / math.max(exact.size, 1)
    assert(recall >= 0.9, s"recall $recall; exact=${exact.size} approx=${approx.size}")
  }

  test("simhash is deterministic and groups exact dups") {
    val a = Dedup.simhash(docs, col("text"), col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.simhash(docs, col("text"), col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a(0L) === a(2L)) // identical text → identical fingerprint
    assert(a(0L) !== a(3L))
  }
}
