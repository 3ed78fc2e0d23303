package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks the latest right row at or before left time") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:20")),
      (3L, "B", ts("2024-01-01 10:00:10")),
      (4L, "A", ts("2024-01-01 09:59:00")) // before any quote
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:10"), 101.0),
      ("A", ts("2024-01-01 10:00:20"), 102.0), // equal ts counts (<=)
      ("B", ts("2024-01-01 10:00:01"), 50.0)
    ).toDF("sym", "qt", "price")

    val res = AsOf.join(
        trades, col("sym"), col("t"),
        quotes, col("sym"), col("qt"),
        Seq("price" -> col("price")))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap

    assert(res(1L) === Some(100.0)) // 10:00:05 → quote at 10:00:00
    assert(res(2L) === Some(102.0)) // equal timestamp included
    assert(res(3L) === Some(50.0))
    assert(res(4L) === None)        // no quote yet
  }

  test("asof forward picks the earliest right row at or after left time") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:20")), // equal ts counts (>=)
      (3L, "A", ts("2024-01-01 10:00:30"))  // after the last quote
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:10"), 101.0),
      ("A", ts("2024-01-01 10:00:20"), 102.0)
    ).toDF("sym", "qt", "price")
    val res = AsOf.join(
        trades, col("sym"), col("t"),
        quotes, col("sym"), col("qt"),
        Seq("price" -> col("price")), direction = "forward")
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(res(1L) === Some(101.0)) // 10:00:05 → next quote at 10:00:10
    assert(res(2L) === Some(102.0)) // equal timestamp included
    assert(res(3L) === None)        // nothing follows
  }

  test("asof tolerance nulls matches beyond the gap, keeps the left row") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")), // 5 s after the quote — within
      (2L, "A", ts("2024-01-01 10:30:00")), // 20 min after — beyond
      (3L, "B", ts("2024-01-01 10:00:10"))  // no quote at all
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:10:00"), 101.0)
    ).toDF("sym", "qt", "price")
    val res = AsOf.join(
        trades, col("sym"), col("t"),
        quotes, col("sym"), col("qt"),
        Seq("price" -> col("price")),
        toleranceTicks = Some(60L * 1000000)) // 1 minute in micros
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(res(1L) === Some(100.0))
    assert(res(2L) === None) // match exists (10:10) but 20 min away
    assert(res(3L) === None)
    assert(res.size === 3)   // every left row kept
  }

  test("asof nearest with tolerance: out-of-gap sides drop out of the pick") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:59"))
    ).toDF("trade_id", "sym", "t")
    // backward quote 59 s away (within a 60 s tolerance), forward
    // quote 61 s away (beyond): nearest must pick backward and must
    // NOT fall back to the invalid forward side. (A closer-but-
    // invalid vs farther-valid flip cannot exist under a single
    // symmetric tolerance — closer out implies both out, the
    // both-out → null case asserted below.)
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0), // 59 s back — within 60 s
      ("A", ts("2024-01-01 10:02:00"), 101.0)  // 61 s forward — beyond
    ).toDF("sym", "qt", "price")
    val near = AsOf.join(
        trades, col("sym"), col("t"),
        quotes, col("sym"), col("qt"),
        Seq("price" -> col("price")), direction = "nearest",
        toleranceTicks = Some(60L * 1000000))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(near(1L) === Some(100.0))
    // now shrink tolerance below both gaps: no match at all
    val none = AsOf.join(
        trades, col("sym"), col("t"),
        quotes, col("sym"), col("qt"),
        Seq("price" -> col("price")), direction = "nearest",
        toleranceTicks = Some(10L * 1000000))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(none(1L) === None)
  }

  test("asof nearest picks the closer side, backward on ties") {
    // long times make the distance arithmetic explicit
    val evs = Seq(
      (1L, "A", 10L), // back 8 (d=2) vs fwd 13 (d=3) → backward
      (2L, "A", 12L), // back 8 (d=4) vs fwd 13 (d=1) → forward
      (3L, "A", 18L), // back 13 (d=5) = fwd 23 (d=5) → tie → backward
      (4L, "A", 2L)   // nothing before → forward
    ).toDF("ev_id", "k", "t")
    val ref = Seq(
      ("A", 8L, "q8"), ("A", 13L, "q13"), ("A", 23L, "q23")
    ).toDF("k", "rt", "v")
    val res = AsOf.join(evs, col("k"), col("t"),
        ref, col("k"), col("rt"),
        Seq("v" -> col("v")), direction = "nearest")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(res === Map(1L -> "q8", 2L -> "q13", 3L -> "q13", 4L -> "q8"))
  }

  test("asof nearest resolves sub-second timestamp distances and date columns") {
    // forward match is 100 ms away, backward 900 ms — a whole-second
    // comparison would tie them and mis-pick backward
    val evs = Seq((1L, "A", ts("2024-01-01 10:00:10.900")))
      .toDF("ev_id", "k", "t")
    val ref = Seq(
      ("A", ts("2024-01-01 10:00:10.000"), "early"),
      ("A", ts("2024-01-01 10:00:11.000"), "late")
    ).toDF("k", "rt", "v")
    val got = AsOf.join(evs, col("k"), col("t"), ref, col("k"), col("rt"),
        Seq("v" -> col("v")), direction = "nearest")
      .head().getString(3)
    assert(got === "late")
    // DATE time columns cannot cast to long — nearest must still work
    val dEvs = Seq((1L, "A", java.sql.Date.valueOf("2024-01-10")))
      .toDF("ev_id", "k", "t")
    val dRef = Seq(
      ("A", java.sql.Date.valueOf("2024-01-01"), "jan1"),
      ("A", java.sql.Date.valueOf("2024-01-12"), "jan12")
    ).toDF("k", "rt", "v")
    val dGot = AsOf.join(dEvs, col("k"), col("t"), dRef, col("k"), col("rt"),
        Seq("v" -> col("v")), direction = "nearest")
      .head().getString(3)
    assert(dGot === "jan12") // 2 days away beats 9 days away
  }

  test("asof carries the nearest ROW's payload — NULL stays NULL, never an older value") {
    // the nearest-in-time quote has a NULL price; tolerance admits it
    // but NOT the older non-null quote. The match must carry NULL —
    // carrying the older row's 100.0 would smuggle an out-of-tolerance
    // value through a vetted-looking match.
    val trades = Seq((1L, "A", ts("2024-01-01 10:10:00")))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), Some(100.0)), // 10 min back — beyond tol
      ("A", ts("2024-01-01 10:09:30"), None)         // 30 s back — within tol
    ).toDF("sym", "qt", "price")
    for (dir <- Seq("backward", "nearest")) {
      val res = AsOf.join(trades, col("sym"), col("t"),
          quotes, col("sym"), col("qt"),
          Seq("price" -> col("price")), direction = dir,
          toleranceTicks = Some(60L * 1000000))
        .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
      assert(res(1L) === None, s"direction=$dir")
    }
    // and WITHOUT tolerance: backward still reports the nearest row's
    // NULL, not the older 100.0 (pandas merge_asof semantics)
    val plain = AsOf.join(trades, col("sym"), col("t"),
        quotes, col("sym"), col("qt"),
        Seq("price" -> col("price")))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(plain(1L) === None)
    // forward mirror: nearest following row has NULL payload
    val fTrades = Seq((1L, "A", ts("2024-01-01 09:00:00")))
      .toDF("trade_id", "sym", "t")
    val fRes = AsOf.join(fTrades, col("sym"), col("t"),
        quotes, col("sym"), col("qt"),
        Seq("price" -> col("price")), direction = "forward")
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(fRes(1L) === Some(100.0)) // 10:00 row IS the nearest forward row
    val fTrades2 = Seq((1L, "A", ts("2024-01-01 10:05:00")))
      .toDF("trade_id", "sym", "t")
    val fRes2 = AsOf.join(fTrades2, col("sym"), col("t"),
        quotes, col("sym"), col("qt"),
        Seq("price" -> col("price")), direction = "forward")
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(fRes2(1L) === None) // nearest forward row (10:09:30) has NULL price
  }

  test("bucketed asof == plain asof for every direction/tolerance/width") {
    // deterministic pseudo-random fixture: clustered timestamps so
    // buckets are sometimes empty, sometimes dense, and matches
    // regularly cross bucket boundaries
    def lcg(seed: Long): LazyList[Long] =
      LazyList.iterate(seed)(s => (s * 6364136223846793005L + 1442695040888963407L))
    val rnd = lcg(42).map(s => math.abs(s % 100000L))
    val lefts = (0 until 300).map(i =>
      (i.toLong, s"k${rnd(i) % 5}", rnd(i + 300))).toDF("id", "k", "t")
    val rights = (0 until 120).map(i =>
      (s"k${rnd(i + 600) % 5}", rnd(i + 720),
        if (i % 7 == 0) None else Some(i.toDouble))).toDF("k", "rt", "v")
      // right rows unique per (key, time) — the operator's precondition
      .groupBy("k", "rt").agg(max("v").as("v"))
    for {
      dir <- Seq("backward", "forward", "nearest")
      tol <- Seq(None, Some(500L), Some(20000L))
      width <- Seq(1L, 97L, 5000L, 1000000L) // incl. one-tick and one-bucket-fits-all
    } {
      val plain = AsOf.join(lefts, col("k"), col("t"),
          rights, col("k"), col("rt"), Seq("v" -> col("v")),
          direction = dir, toleranceTicks = tol)
        .orderBy("id").collect().map(_.toSeq).toSeq
      val bucketed = AsOf.join(lefts, col("k"), col("t"),
          rights, col("k"), col("rt"), Seq("v" -> col("v")),
          direction = dir, toleranceTicks = tol, bucketTicks = Some(width))
        .orderBy("id").collect().map(_.toSeq).toSeq
      assert(bucketed === plain, s"dir=$dir tol=$tol width=$width")
    }
  }

  test("asof plan shuffles once on the key — no range-join explosion") {
    val trades = Seq((1L, "A", ts("2024-01-01 10:00:05"))).toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", ts("2024-01-01 10:00:00"), 1.0)).toDF("sym", "qt", "price")
    val plan = AsOf.join(trades, col("sym"), col("t"),
        quotes, col("sym"), col("qt"), Seq("price" -> col("price")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
