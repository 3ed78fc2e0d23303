package graft

import graft.streaming.EventPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  test("streaming windowed agg matches the batch computation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Seq(
      ("2024-01-01 00:05:00", "click", 1.0),
      ("2024-01-01 00:15:00", "click", 2.0),
      ("2024-01-01 00:45:00", "view", 3.0),
      ("2024-01-01 01:05:00", "click", 4.0),
      ("2024-01-01 01:30:00", "view", 5.0)
    ).map { case (t, e, v) => (Timestamp.valueOf(t), e, v) }

    val stream = MemoryStream[(Timestamp, String, Double)]
    val events = stream.toDF().toDF("ts", "event_type", "value")

    val query = EventPipeline.windowedAgg(events)
      .writeStream.format("memory").queryName("agg")
      .outputMode("complete").start()
    try {
      stream.addData(rows: _*)
      query.processAllAvailable()

      val streamed = spark.table("agg")
        .orderBy("hour", "event_type")
        .collect().map(_.toSeq).toSeq

      val batch = EventPipeline.windowedAgg(rows.toDF("ts", "event_type", "value"))
        .orderBy("hour", "event_type")
        .collect().map(_.toSeq).toSeq

      assert(streamed === batch)
      assert(streamed.size === 4) // (00h click), (00h view), (01h click), (01h view)
    } finally query.stop()
  }

  test("session_window sessionize agrees with the lag-based query") {
    import org.apache.spark.sql.functions._
    val events = graft.core.Tables.events(spark, sfDir)

    // sessions per user from the native session_window
    val sw = graft.streaming.EventPipeline.sessionize(events)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // sessions per user from the lag/gap formulation (the oracle'd query)
    val lagBased = graft.SparkEntry.queries("events_sessionize")(spark, sfDir)
      .select("user_id", "n_sessions")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(sw === lagBased)
  }
}
