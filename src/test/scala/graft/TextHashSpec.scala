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
    val video = Multimodal.syntheticVideoPayload(p, col("doc_id"), nFrames = 3)
    val frames = Multimodal.sampleFrames(video, every = 1)
    assert(frames.count() === 9)
    assert(frames.groupBy("doc_id").count().collect().forall(_.getLong(1) == 3))
  }

  test("repetition signals match hand computation") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a a b"),                 // dup 1/3; bigrams "a a","a b" → top 1/2
      (1L, "x y z w"),               // dup 0; all bigrams unique → top 1/3
      (2L, "solo"),                  // single token: no bigrams → 0.0
      (3L, "go go go go")            // dup 3/4; bigram "go go" ×3 → top 1
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs, col("text"), col("doc_id"))
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r(0L) === ((0.333333, 0.5)))
    assert(r(1L) === ((0.0, 0.333333)))
    assert(r(2L) === ((0.0, 0.0)))
    assert(r(3L) === ((0.75, 1.0)))
  }

  test("token-budgeted shards pack per part in id order") {
    import spark.implicits._
    // part p: 3 docs of 2 tokens each, budget 4 → docs 0,1 in shard 0
    // (cum-before 0,2), doc 2 in shard 1 (cum-before 4)
    val docs = Seq(
      (0L, "t t", "p"), (1L, "t t", "p"), (2L, "t t", "p"),
      (3L, "u u u u u", "q")
    ).toDF("doc_id", "text", "source")
    val s = graft.ops.Sharding.tokenBudgeted(docs, col("text"), col("doc_id"),
        col("source"), 4L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(s(("p", 0L)) === ((2L, 4L)))
    assert(s(("p", 1L)) === ((1L, 2L)))
    assert(s(("q", 0L)) === ((1L, 5L)))
  }

  test("context chunks: docs straddle window cuts with exact coverage") {
    import spark.implicits._
    // part p concat stream: doc 0 spans [0,3), doc 1 [3,9), doc 2
    // [9,10); L=4 → chunks [0,4) [4,8) [8,10). Doc 1 straddles all
    // three; only the final chunk is partial (2 of 4 slots).
    val docs = Seq(
      (0L, "a a a", "p"), (1L, "b b b b b b", "p"), (2L, "c", "p")
    ).toDF("doc_id", "text", "source")
    val got = graft.ops.Sharding.contextChunks(docs, col("text"),
        col("doc_id"), col("source"), 4L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("p", 0L)) === ((2L, 2L, 4L))) // docs 0,1 touch; both start here
    assert(got(("p", 1L)) === ((1L, 0L, 4L))) // doc 1 mid-span, no starts
    assert(got(("p", 2L)) === ((2L, 1L, 2L))) // doc 1 tail + doc 2; partial
    // conservation: starts sum to doc count, tokens sum to stream length
    assert(got.values.map(_._2).sum === 3L)
    assert(got.values.map(_._3).sum === 10L)
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
