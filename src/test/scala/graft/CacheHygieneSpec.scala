package graft

import org.apache.spark.sql.functions._
import org.scalatest.concurrent.Eventually
import org.scalatest.time.{Seconds, Span}
import graft.core.Tables
import graft.ops.{Dedup, Knn}

/** Operators must not leak session-lifetime cache state (r2 verdict
  * item 2): a long-lived session running many queries (Bench/Verify
  * run 58 in one session) must not accumulate pinned blocks.
  *
  * Two tiers of guarantee, both asserted here:
  *  - non-iterative operators register NOTHING: no CacheManager entry,
  *    no persistent RDD — reuse is plan-level (ReusedExchange), so
  *    there is no block to leak by construction;
  *  - the iterative `clusters` materializes rounds via localCheckpoint,
  *    whose blocks are owned by the RDD object and reclaimed by the
  *    ContextCleaner on GC — bounded lifetime without a caller-side
  *    unpersist protocol. Asserted by dropping the reference, forcing
  *    GC and watching getPersistentRDDs drain to empty.
  */
class CacheHygieneSpec extends SparkSpec with Eventually {

  private def docs = Tables.documents(spark, sfDir)
  private def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private def assertNoPinnedState(): Unit = {
    assert(spark.sharedState.cacheManager.isEmpty,
      "operator left an entry in the session CacheManager")
  }

  private def drainCheckpoints(): Unit =
    eventually(timeout(Span(30, Seconds))) {
      System.gc()
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        "checkpoint blocks not reclaimed after GC")
    }

  // suites share one SparkSession: earlier suites' checkpoint-backed
  // operators (clusters, heavyHitters, pageRankConverged, …) may have
  // UNREFERENCED blocks the ContextCleaner hasn't collected yet. The
  // contract under test is "reclaimable, never pinned" — so drain
  // (GC + wait) once up front; anything that survives GC here really
  // is a leak and fails loudly.
  override def beforeAll(): Unit = {
    super.beforeAll()
    drainCheckpoints()
  }

  test("ngramJaccard materializes with zero persistent state") {
    noop(Dedup.ngramJaccard(docs, col("text"), col("doc_id")))
    assertNoPinnedState()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("minhashLsh materializes with zero persistent state") {
    noop(Dedup.minhashLsh(docs, col("text"), col("doc_id")))
    assertNoPinnedState()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("simhashPairs materializes with zero persistent state") {
    noop(Dedup.simhashPairs(docs, col("text"), col("doc_id")))
    assertNoPinnedState()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("Knn.topK materializes with zero persistent state") {
    val part = Tables.part(spark, sfDir)
    val w = Knn.keyValueWeights(part, Seq("p_brand", "p_size"),
      col("p_type") === "ECONOMY")
    noop(Knn.topK(part, w, Seq("p_brand", "p_size"),
      Map("p_brand" -> "Brand#13", "p_size" -> "10"), "p_partkey", 10))
    assertNoPinnedState()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("substringPairs materializes with zero persistent state") {
    noop(Dedup.substringPairs(docs, col("text"), col("doc_id")))
    assertNoPinnedState()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("contaminated's eval-shingle checkpoint drains after the result drops") {
    noop(graft.ops.Curation.contaminated(docs, col("text"), col("doc_id"),
      col("doc_id") % 20 === 0))
    assertNoPinnedState() // sizing checkpoint is never CacheManager-pinned
    drainCheckpoints()    // and its blocks drain on GC like clusters'
  }

  test("clusters' checkpoint blocks are GC-reclaimed, never CacheManager-pinned") {
    // scope the result so the reference is droppable before the drain
    def runOnce(): Unit =
      noop(Dedup.simhashGroups(docs, col("text"), col("doc_id")))
    runOnce()
    assertNoPinnedState() // never pinned, even while blocks still live
    drainCheckpoints()    // and the blocks themselves drain on GC
  }
}
