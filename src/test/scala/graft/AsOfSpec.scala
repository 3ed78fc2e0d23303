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
