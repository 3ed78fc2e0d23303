package graft

import graft.ops.{Multimodal, TextAnalysis}
import graft.streaming.EventPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TextHashSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and keeps running"),
    (1L, "the quick brown fox jumps over the lazy dog and keeps running"), // exact dup
    (2L, "a completely different document with entirely other content here")
  ).toDF("doc_id", "text")

  test("rolling fingerprint: equal texts equal, different texts differ") {
    val fp = TextAnalysis.rollingFingerprint(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) === fp(1L))
    assert(fp(0L) !== fp(2L))
    // deterministic across runs
    val fp2 = TextAnalysis.rollingFingerprint(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp === fp2)
  }

  test("rolling fingerprint handles short and empty strings") {
    val tiny = Seq((0L, ""), (1L, "ab"), (2L, "ab")).toDF("doc_id", "text")
    val fp = TextAnalysis.rollingFingerprint(tiny, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) === 0L)
    assert(fp(1L) === fp(2L))
  }

  test("frame sampling emits n frames per payload") {
    val p = Multimodal.asPayload(docs, col("text"), col("doc_id"))
    val frames = Multimodal.stubFrameSample(p, 3)
    assert(frames.count() === 9)
    assert(frames.groupBy("doc_id").count().collect().forall(_.getLong(1) == 3))
  }

  test("streaming dedup keeps first occurrence per key") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val df = stream.toDF().toDF("doc_id", "text", "ts")
    val q = EventPipeline.dedupStream(df, "doc_id", "ts")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      val t = Timestamp.valueOf("2024-01-01 00:00:00")
      stream.addData((1L, "a", t), (1L, "a-dup", t), (2L, "b", t))
      q.processAllAvailable()
      val rows = spark.table("dedup").collect()
      assert(rows.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }
}
