package graft

import graft.core.IndexSpec
import graft.ops.Merge
import org.apache.spark.sql.functions._

/** Mirrors the reference's merge edge-case tests
  * (DfTest."merging-zero-indexed-dfs", "empty-indexed-multidf",
  * "indexed-multidf"): zero segments merge to a valid empty frame,
  * and a merged index equals the index of the concatenation.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val spec = IndexSpec(Seq("cat"))
  private def segA = Seq((1L, "a"), (2L, "b")).toDF("id", "cat")
  private def segB = Seq((3L, "a"), (4L, "c")).toDF("id", "cat")

  test("merging zero segments yields a valid empty frame and index") {
    val empty = Merge.multiFrame(spark, segA.schema, Seq.empty)
    assert(empty.count() === 0)
    assert(empty.schema === segA.schema)
    val emptyIx = Merge.mergedIndex(spark, Seq.empty, spec)
    assert(emptyIx.count() === 0)
    assert(emptyIx.columns.toSeq === Seq("field", "value", "f"))
    // an empty index still answers queries (with empty results), as
    // the reference's tDf exercises on the empty multidf
    assert(emptyIx.where(col("field") === "cat").count() === 0)
  }

  test("segments with differing column sets merge; absent columns read as null") {
    // reference DfTest."merging": MultiDf merge-sorts the UNION of
    // per-segment colIds and reads absent columns as empty
    // (MultiDf.scala:43-57,109) — here segB lacks `score`, segC lacks
    // `cat`; the merge carries all three columns, null-filled
    val sA = Seq((1L, "a", 0.5)).toDF("id", "cat", "score")
    val sB = Seq((2L, "b")).toDF("id", "cat")
    val sC = Seq((3L, 0.9)).toDF("id", "score")
    val m = Merge.multiFrame(Seq(sA, sB, sC)).orderBy("id")
    assert(m.columns.toSeq === Seq("id", "cat", "score"))
    val rows = m.collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(r => Option(r.get(1))).toSeq ===
      Seq(Some("a"), Some("b"), None))
    assert(rows.map(r => Option(r.get(2))).toSeq ===
      Seq(Some(0.5), None, Some(0.9)))
    // the merged index treats the null-filled column like any null
    // value (null is a first-class indexed value in this library —
    // the same posture as index_colvalues), so the segment lacking
    // `cat` contributes one ("cat", null) entry
    val ix = Merge.mergedIndex(Seq(sA, sB, sC), spec).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ix === Map(("cat", "a") -> 1L, ("cat", "b") -> 1L,
      ("cat", null) -> 1L))
  }

  test("merged index equals the index of the concatenation") {
    val merged = Merge.mergedIndex(Seq(segA, segB), spec)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(merged === Map(
      ("cat", "a") -> 2L, ("cat", "b") -> 1L, ("cat", "c") -> 1L))
    // single-segment merge is the segment's own index
    val single = Merge.mergedIndex(Seq(segA), spec)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(single === Map(("cat", "a") -> 1L, ("cat", "b") -> 1L))
  }
}
