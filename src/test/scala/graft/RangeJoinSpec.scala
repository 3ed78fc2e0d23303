package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** The bucketed range join must equal the naive non-equi join exactly
  * — including the three shapes the bucket trick has to get right:
  * boundary gaps (Δ exactly = tol), adjacent-bucket pairs (the b+1
  * duplicate's whole reason to exist), and timestamp ties (canonical
  * id order, each pair once, never a self-pair).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val tol = 100L

  // (key, ticks, id) — long ticks for exact boundary control
  private val rows = Seq(
    // same-bucket pair (bucket 0): gap 30
    (1L, 10L, 1L), (1L, 40L, 2L),
    // adjacent-bucket pair: 95 (bucket 0) and 150 (bucket 1), gap 55
    (1L, 95L, 3L), (1L, 150L, 4L),
    // boundary-exact: gap == tol must be IN
    (2L, 200L, 5L), (2L, 300L, 6L),
    // one past the boundary: gap == tol+1 must be OUT even though the
    // rows share adjacent buckets
    (2L, 400L, 7L), (2L, 501L, 8L),
    // timestamp tie: one canonical (id) pair, no self-pairs
    (3L, 50L, 9L), (3L, 50L, 10L),
    // different keys never pair, however close in time
    (4L, 60L, 11L), (5L, 61L, 12L),
    // two tol-widths apart: same key, no pair
    (6L, 0L, 13L), (6L, 250L, 14L))

  test("bucketed range join equals the naive non-equi join") {
    val df = rows.toDF("k", "t", "id")
    val got = RangeJoin.selfWithin(df, col("k"), col("t"), col("id"), tol)
      .select("key", "id_a", "id_b", "gap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val a = df.select(col("k"), col("t").as("ta"), col("id").as("ia"))
    val b = df.select(col("k"), col("t").as("tb"), col("id").as("ib"))
    val naive = a.join(b, Seq("k"))
      .where(col("tb") >= col("ta") && col("tb") - col("ta") <= tol &&
        (col("ta") < col("tb") || col("ia") < col("ib")))
      .select(col("k"), col("ia"), col("ib"), (col("tb") - col("ta")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === naive)
    // the planted shapes actually occurred
    assert(got.contains((1L, 1L, 2L, 30L)), "same-bucket pair")
    assert(got.contains((1L, 3L, 4L, 55L)), "adjacent-bucket pair")
    assert(got.contains((2L, 5L, 6L, 100L)), "boundary gap == tol kept")
    assert(!got.exists(p => p._2 == 7L && p._3 == 8L), "tol+1 dropped")
    assert(got.contains((3L, 9L, 10L, 0L)), "tie pair once, canonical")
    assert(!got.exists(p => p._2 == p._3), "no self-pairs")
    assert(!got.exists(p => p._2 == 11L || p._2 == 12L), "keys isolate")
  }

  test("every qualifying pair is produced exactly once (no dup pass)") {
    // dense same-key cluster where naive join has many pairs spanning
    // both the b and b+1 match routes
    val dense = (0L until 60L).map(i => (9L, i * 7L, i)).toDF("k", "t", "id")
    val got = RangeJoin.selfWithin(dense, col("k"), col("t"), col("id"), tol)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size, "no duplicate pairs")
    // gap ≤ 100 with spacing 7 → each row pairs with the next 14
    val expected = (for (i <- 0L until 60L; j <- i + 1 until 60L
                         if (j - i) * 7L <= tol) yield (i, j)).toSet
    assert(got.toSet === expected)
  }
}
