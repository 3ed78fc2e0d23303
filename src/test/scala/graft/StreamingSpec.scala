package graft

import graft.streaming.EventPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  test("streaming token budget takes arrival-order docs under budget") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // source s: 4+4+4 tokens per doc, budget 9 → docs 1,2,3 emit
    // (cum_before 0,4,8), doc 4 arrives in batch 2 with cum 12 → cut
    val b1 = Seq((1L, "a b c d", "s"), (2L, "e f g h", "s"))
    val b2 = Seq((3L, "i j k l", "s"), (4L, "m n o p", "s"),
      (10L, "x y", "t"))
    val stream = MemoryStream[(Long, String, String)]
    val docs = stream.toDF().toDF("doc_id", "text", "source")
    val q = EventPipeline.tokenBudgetStream(docs, "text", "doc_id",
        "source", 9L)
      .writeStream.format("memory").queryName("tb")
      .outputMode("append").start()
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("tb").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
      assert(got === Set(("s", 1L, 0L), ("s", 2L, 4L), ("s", 3L, 8L),
        ("t", 10L, 0L)))
    } finally q.stop()
  }

  test("streaming heavy hitters: candidates are a superset across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // planted hot token "hot" (count 30 of N=80) + long cold tail
    val batch1 = Seq.fill(20)("hot doc") ++ (1 to 20).map(i => s"c$i x$i")
    val batch2 = Seq.fill(10)("hot doc") ++ (21 to 30).map(i => s"c$i x$i")
    val k = 10

    val stream = MemoryStream[String]
    val docs = stream.toDF().toDF("text")
    val q = EventPipeline.heavyHittersStream(docs, "text", k, groups = 4)
      .writeStream.format("memory").queryName("hh")
      .outputMode("append").start()
    try {
      stream.addData(batch1: _*); q.processAllAvailable()
      stream.addData(batch2: _*); q.processAllAvailable()

      val rows = spark.table("hh").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // final candidate set = each group's highest version
      val lastVer = rows.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
      val finals = rows.filter { case (g, _, _, v) => v == lastVer(g) }
      val cands = finals.map(_._2).toSet
      // guarantee: the genuinely heavy tokens survive
      assert(cands.contains("hot") && cands.contains("doc"))
      // determinism: a sequential MG replay of the same batch split
      // (per group, sorted within each batch) gives the same sets
      def grpOf(t: String): Long = {
        val g = Seq(t).toDF("tok")
          .select(pmod(xxhash64(col("tok")), lit(4))).head.getLong(0)
        g
      }
      val toks1 = batch1.flatMap(_.split(" ")); val toks2 = batch2.flatMap(_.split(" "))
      val byGrp1 = toks1.groupBy(grpOf); val byGrp2 = toks2.groupBy(grpOf)
      for (g <- (byGrp1.keySet ++ byGrp2.keySet)) {
        val m = graft.ops.HeavyHitters.misraGriesFold(
          scala.collection.mutable.HashMap.empty[String, Long],
          byGrp1.getOrElse(g, Nil).sorted.iterator, k)
        graft.ops.HeavyHitters.misraGriesFold(
          m, byGrp2.getOrElse(g, Nil).sorted.iterator, k)
        val got = finals.filter(_._1 == g).map(t => t._2 -> t._3).toMap
        assert(got === m.toMap, s"group $g")
      }
      // bounded state: never more than k-1 candidates per group
      assert(finals.groupBy(_._1).values.forall(_.length <= k - 1))
    } finally q.stop()
  }

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

  test("stream-stream interval join pairs events within the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._

    val clicks = MemoryStream[(Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("user_id", "cts").withWatermark("cts", "1 hour")
    val v = views.toDF().toDF("v_user_id", "vts").withWatermark("vts", "1 hour")

    // view followed by a click from the same user within 10 minutes
    val joined = v.join(c,
      col("v_user_id") === col("user_id") &&
        col("cts") >= col("vts") &&
        col("cts") <= col("vts") + expr("INTERVAL 10 MINUTES"))

    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      views.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
      clicks.addData(
        (1L, ts("2024-01-01 10:05:00")),  // within window → joins
        (2L, ts("2024-01-01 10:30:00")))  // outside window → dropped
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
      assert(rows.length === 1)
      assert(rows.head.getLong(2) === 1L)
    } finally q.stop()
  }

  test("map-only minhash signature equals the grouped signature build") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val grouped = graft.ops.Dedup.minhashSignatures(
        graft.ops.Dedup.shingles(docs, col("text"), col("doc_id")), k = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val mapOnly = docs.select(col("doc_id"),
        graft.ops.Dedup.minhashSigCol(col("text"), k = 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(mapOnly === grouped)
  }

  test("streaming minhash dedup keeps the first doc per near-dup signature") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Timestamp, Long, String)]
    val docs = stream.toDF().toDF("ts", "doc_id", "text")

    val q = EventPipeline.minhashDedupStream(docs, "text", "ts")
      .writeStream.format("memory").queryName("mhdedup")
      .outputMode("append").start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      stream.addData(
        (ts("2024-01-01 00:00:00"), 0L, "the quick brown fox jumps over the lazy dog"),
        (ts("2024-01-01 00:01:00"), 1L, "the quick brown fox jumps over the lazy dog"), // dup of 0
        (ts("2024-01-01 00:02:00"), 2L, "totally different content about query engines and sparks"))
      q.processAllAvailable()
      stream.addData(
        (ts("2024-01-01 00:03:00"), 3L, "the quick brown fox jumps over the lazy dog")) // late dup of 0
      q.processAllAvailable()
      val kept = spark.table("mhdedup").select("doc_id")
        .as[Long].collect().toSet
      assert(kept === Set(0L, 2L)) // 1 and 3 deduped against 0's signature
    } finally q.stop()
  }

  test("streaming simhash dedup fingerprints equal the batch operator's") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Timestamp, Long, String)]
    val docs = stream.toDF().toDF("ts", "doc_id", "text")

    val q = EventPipeline.simhashDedupStream(docs, "text", "ts")
      .writeStream.format("memory").queryName("shdedup")
      .outputMode("append").start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      stream.addData(
        (ts("2024-01-01 00:00:00"), 0L, "alpha beta gamma delta epsilon"),
        (ts("2024-01-01 00:01:00"), 1L, "beta alpha delta gamma epsilon"), // same token SET -> same fp
        (ts("2024-01-01 00:02:00"), 2L, "completely different text body here"))
      q.processAllAvailable()
      val out = spark.table("shdedup")
      val kept = out.select("doc_id").as[Long].collect().toSet
      assert(kept === Set(0L, 2L)) // 1 collides with 0 at hamming 0
      // the streamed fingerprint IS the batch operator's fingerprint
      val batchFp = graft.ops.Dedup.simhash(
          Seq((0L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
          col("text"), col("doc_id"))
        .head().getLong(1)
      val streamFp = out.where(col("doc_id") === 0L).select("fp")
        .head().getLong(0)
      assert(streamFp === batchFp)
    } finally q.stop()
  }

  test("quality scoring and repetition signals run as streaming projections") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // all text-analysis measures are stateless column expressions, so
    // they compose with readStream directly — the streaming curation
    // face of pipeline_curate's quality gate
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val q = graft.ops.TextAnalysis.quality(docs, col("text"), col("doc_id"))
      .where(col("quality") >= 0.5)
      .writeStream.format("memory").queryName("squality")
      .outputMode("append").start()
    try {
      stream.addData(
        (0L, "the cat and the dog are in the house of the king"),
        (1L, "@@@@ #### $$$$ %%%% ^^^^"))
      q.processAllAvailable()
      val kept = spark.table("squality").select("doc_id").as[Long].collect().toSet
      assert(kept === Set(0L)) // natural text passes, symbol soup filtered
      // streamed scores equal the batch operator's on the same rows
      val batch = graft.ops.TextAnalysis.quality(
          Seq((0L, "the cat and the dog are in the house of the king"))
            .toDF("doc_id", "text"), col("text"), col("doc_id"))
        .head().getDouble(5)
      val streamed = spark.table("squality").where(col("doc_id") === 0L)
        .head().getDouble(5)
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming curation gates on original-text quality and scrubs PII") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
    val q = EventPipeline.curateStream(docs, "text", "doc_id", minQuality = 0.5)
      .writeStream.format("memory").queryName("scurate")
      .outputMode("append").start()
    try {
      stream.addData(
        (0L, "the cat and the dog mail jane@example.com or 555-1234 in the house"),
        (1L, "@@@@ #### $$$$ %%%% ^^^^"))
      q.processAllAvailable()
      val out = spark.table("scurate").as[(Long, String, Double)]
        .collect().toSeq
      assert(out.map(_._1) === Seq(0L)) // symbol soup gated out
      assert(out.head._2 ===
        "the cat and the dog mail <EMAIL> or <PHONE> in the house")
      // score judged the ORIGINAL text: identical to the batch operator's
      val batch = graft.ops.TextAnalysis.quality(
          Seq((0L, "the cat and the dog mail jane@example.com or 555-1234 in the house"))
            .toDF("doc_id", "text"), col("text"), col("doc_id"))
        .head().getDouble(5)
      assert(out.head._3 === batch)
    } finally q.stop()
  }

  test("streaming decontaminate flags the same docs as the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = Seq(
      (100L, "What is the Capital of France? Paris, obviously."))
      .toDF("doc_id", "text")
    val evalSh = graft.ops.Curation.evalShingleSet(evalDocs, col("text"), k = 5)

    val corpus = Seq(
      // contaminated: shares the normalized 5-gram despite case/punct
      (0L, "trivia time: WHAT IS THE CAPITAL OF FRANCE!!! answer below"),
      (1L, "a clean training document about distributed query engines here"),
      (2L, "what is the capital of france is a question people ask a lot")
    )
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = stream.toDF().toDF("doc_id", "text", "ts")
    val q = EventPipeline.decontaminateStream(docs, "text", "doc_id", "ts",
        evalSh, k = 5)
      .writeStream.format("memory").queryName("sdecon")
      .outputMode("append").start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      stream.addData(corpus.map { case (i, s) => (i, s, t) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("sdecon").select("doc_id").as[Long]
        .collect().toSet
      // batch face on the same rows: union corpus + eval, is_eval flag
      val batchDf = corpus.toDF("doc_id", "text")
        .withColumn("is_eval", lit(false))
        .unionByName(evalDocs.withColumn("is_eval", lit(true)))
      val batch = graft.ops.Curation.contaminated(batchDf, col("text"),
          col("doc_id"), col("is_eval"), k = 5)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(0L, 2L))
    } finally q.stop()
  }

  test("streaming line scrub flags arriving docs carrying corpus boilerplate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val footer = "subscribe to our newsletter"
    val corpus = Seq(
      (100L, s"corpus page one\n$footer"),
      (101L, s"corpus page two\n$footer"),
      (102L, "a corpus page without any footer at all"))
      .toDF("doc_id", "text")
    val boiler = graft.ops.Dedup.boilerplateLines(corpus,
      col("text"), col("doc_id"))
    // exactly the footer (2 distinct corpus docs) is boilerplate
    assert(boiler.count() === 1L)

    val arriving = Seq(
      (0L, s"fresh arriving page\n$footer"), // carries corpus boilerplate
      (1L, "an entirely novel arriving page"),
      (2L, s"$footer\nanother carrier, footer first"))
    val stream = MemoryStream[(Long, String, Timestamp)]
    val docs = stream.toDF().toDF("doc_id", "text", "ts")
    val q = EventPipeline.lineScrubStream(docs, "text", "doc_id", "ts", boiler)
      .writeStream.format("memory").queryName("linescrub")
      .outputMode("append").start()
    try {
      val t = Timestamp.valueOf("2024-01-01 00:00:00")
      stream.addData(arriving.map { case (i, s) => (i, s, t) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("linescrub").select("doc_id")
        .as[Long].collect().toSet
      // the batch spelling of the same incremental contract agrees
      val batch = arriving.toDF("doc_id", "text")
        .select(col("doc_id"), explode(split(col("text"), "\n")).as("line"))
        .select(col("doc_id"), md5(col("line")).as("lh"))
        .join(boiler, "lh").select("doc_id").as[Long].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(0L, 2L))
    } finally q.stop()
  }

  test("streaming cross-corpus dedup flags the same docs as the batch face") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "an existing corpus document about distributed query engines"))
      .toDF("doc_id", "text")
    val corpusBands = graft.ops.Dedup.bandedSignatures(corpus,
      col("text"), col("doc_id"), k = 16, bands = 4)

    val arriving = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 100
      (1L, "a completely novel document with fresh content and words"),
      (2L, "an existing corpus document about distributed query engines")) // dup of 101

    val stream = MemoryStream[(Long, String, Timestamp)]
    val docs = stream.toDF().toDF("doc_id", "text", "ts")
    val q = EventPipeline.crossDedupStream(docs, "text", "doc_id", "ts",
        corpusBands, k = 16, bands = 4)
      .writeStream.format("memory").queryName("xdedup")
      .outputMode("append").start()
    try {
      val t = Timestamp.valueOf("2024-01-01 00:00:00")
      stream.addData(arriving.map { case (i, s) => (i, s, t) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("xdedup").select("doc_id")
        .as[Long].collect().toSet
      // batch face on the same rows flags the same arriving docs
      val batch = graft.ops.Dedup.minhashLshCross(
          arriving.toDF("doc_id", "text"), corpus,
          col("text"), col("doc_id"), k = 16, bands = 4)
        .select("new_id").as[Long].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(0L, 2L))
    } finally q.stop()
  }

  test("streaming cross dedup applies the batch face's bucket skew cap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // degenerate corpus: every doc identical → every bucket hot →
    // dropped by the cap on BOTH faces, so an arriving copy of the
    // boilerplate is flagged by neither
    val corpus = spark.range(300).select(col("id").as("doc_id"),
      lit("the same boilerplate text repeated in every single document here")
        .as("text"))
    val corpusBands = graft.ops.Dedup.bandedSignatures(corpus,
      col("text"), col("doc_id"), k = 16, bands = 4)
    val stream = MemoryStream[(Long, String, Timestamp)]
    val docs = stream.toDF().toDF("doc_id", "text", "ts")
    val q = EventPipeline.crossDedupStream(docs, "text", "doc_id", "ts",
        corpusBands, k = 16, bands = 4, maxBucket = 50L)
      .writeStream.format("memory").queryName("xdedupcap")
      .outputMode("append").start()
    try {
      stream.addData((1000L,
        "the same boilerplate text repeated in every single document here",
        Timestamp.valueOf("2024-01-01 00:00:00")))
      q.processAllAvailable()
      assert(spark.table("xdedupcap").count() === 0)
      // batch face agrees: the hot bucket is capped there too
      assert(graft.ops.Dedup.minhashLshCross(
        Seq((1000L, "the same boilerplate text repeated in every single document here"))
          .toDF("doc_id", "text"),
        corpus, col("text"), col("doc_id"), k = 16, bands = 4,
        maxBucket = 50L).count() === 0)
    } finally q.stop()
  }

  test("cross-corpus dedup over the REAL documents parquet: stream == batch") {
    import spark.implicits._
    // the eventsStream precedent applied to the ingest-dedup face:
    // drive crossDedupStream from a file-source stream over the live
    // documents table (Tables.documentsStream), not a MemoryStream
    // fixture. Corpus = the same docs with shifted ids, so every
    // arriving doc with a non-null signature is an exact near-dup —
    // the join must flag them all, and exactly as the batch face does.
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    val corpus = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      col("text"))
    val corpusBands = graft.ops.Dedup.bandedSignatures(corpus,
      col("text"), col("doc_id"), k = 16, bands = 4)
      .localCheckpoint(true) // fixed for the stream's lifetime
    val arriving = graft.core.Tables.documentsStream(spark, sfDir)
      .select(col("doc_id"), col("text"),
        // offset from epoch: a ts of exactly 0 ties the INITIAL
        // watermark and is discarded as late — doc_id 0 would vanish
        timestamp_micros(col("doc_id") + 86400000000L)
          .cast("timestamp").as("ts"))
    val q = EventPipeline.crossDedupStream(arriving, "text", "doc_id", "ts",
        corpusBands, k = 16, bands = 4)
      .writeStream.format("memory").queryName("xdedup_real")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("xdedup_real").select("doc_id")
        .as[Long].collect().toSet
      val batch = graft.ops.Dedup.minhashLshCross(
          docs, corpus, col("text"), col("doc_id"), k = 16, bands = 4)
        .select("new_id").as[Long].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stateful streaming shard packing matches the batch assignment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // texts sized so shard boundaries land MID-batch and MID-stream:
    // budget 6 tokens, docs of 4 tokens each → shard changes every
    // second doc, and the running count must survive the batch break
    def txt(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val batch1 = Seq(
      (0L, "src_a", txt(4)), (1L, "src_a", txt(4)),
      (2L, "src_b", txt(4)))
    val batch2 = Seq(
      (3L, "src_a", txt(4)), (4L, "src_b", txt(4)),
      (5L, "src_b", txt(4)))

    val stream = MemoryStream[(Long, String, String)]
    val docs = stream.toDF().toDF("doc_id", "source", "text")
    val q = EventPipeline.shardStream(docs, "text", "doc_id", "source", 6L)
      .writeStream.format("memory").queryName("sshard")
      .outputMode("append").start()
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("sshard")
        .select("part", "doc_id", "shard")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val batch = graft.ops.Sharding.assignShards(
          (batch1 ++ batch2).toDF("doc_id", "source", "text"),
          col("text"), col("doc_id"), col("source"), 6L)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
        .toMap
      assert(streamed === batch)
      // the cross-batch boundary did its job: doc 3 (src_a's third doc,
      // arriving in batch 2) continues src_a's count, not a fresh one
      assert(streamed(("src_a", 3L)) === 1L)
    } finally q.stop()
  }

  test("stateful streaming chunk spans match the batch chunk stats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // contextLen 4, docs of 3 tokens → every doc straddles or abuts a
    // window cut, and the running offset must survive the batch break
    def txt(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val batch1 = Seq(
      (0L, "src_a", txt(3)), (1L, "src_a", txt(3)),
      (2L, "src_b", txt(3)))
    val batch2 = Seq(
      (3L, "src_a", txt(3)), (4L, "src_b", txt(3)))

    val stream = MemoryStream[(Long, String, String)]
    val docs = stream.toDF().toDF("doc_id", "source", "text")
    val q = EventPipeline.chunkStream(docs, "text", "doc_id", "source", 4L)
      .writeStream.format("memory").queryName("schunk")
      .outputMode("append").start()
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val spans = spark.table("schunk")
        .select("part", "doc_id", "start_chunk", "end_chunk").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      // doc 3 (src_a's third doc, arriving in batch 2) continues
      // src_a's token offset 6: spans chunks 1..2, not a fresh 0..0
      assert(spans(("src_a", 3L)) === ((1L, 2L)))
      // re-aggregating the streamed rows reproduces the batch face's
      // FULL per-chunk stats — docs, boundary starts, AND token-fill
      val fromStream = spark.table("schunk")
        .withColumn("chunk",
          explode(sequence(col("start_chunk"), col("end_chunk"))))
        .withColumn("e", col("tok_start") + col("ntok"))
        .groupBy("part", "chunk")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("start_chunk") === col("chunk"), 1L).otherwise(0L))
            .as("n_starts"),
          sum(least(col("e"), (col("chunk") + 1) * 4)
            - greatest(col("tok_start"), col("chunk") * 4)).as("n_tokens"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val fromBatch = graft.ops.Sharding.contextChunks(
          (batch1 ++ batch2).toDF("doc_id", "source", "text"),
          col("text"), col("doc_id"), col("source"), 4L)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(fromStream === fromBatch)
    } finally q.stop()
  }

  test("windowed agg over the REAL events parquet: stream face == batch face") {
    // the r6 drift lesson, applied to streaming: the windowed-agg face
    // must run against the live data generation through the shared
    // loader guard (Tables.eventsStream), not only over MemoryStream
    // fixtures whose schema the test itself controls
    val stream = graft.core.Tables.eventsStream(spark, sfDir)
    val query = EventPipeline.windowedAgg(stream)
      .writeStream.format("memory").queryName("agg_real")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("agg_real")
        .orderBy("hour", "event_type")
        .collect().map(_.toSeq).toSeq
      // the batch loader canonicalizes to NTZ; cast to TIMESTAMP to
      // mirror the streaming face's watermark-compatible type
      // (value-identical under the UTC session timezone)
      val batch = EventPipeline.windowedAgg(
          graft.core.Tables.events(spark, sfDir)
            .withColumn("ts", col("ts").cast("timestamp")))
        .orderBy("hour", "event_type")
        .collect().map(_.toSeq).toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("stateful resample over the REAL events parquet matches batch") {
    // the eventsStream precedent applied to the gap-fill face: drive
    // resampleStream from a file-source stream of the live events
    // table and pin it to the batch operator minus each key's
    // still-open last bucket
    val stream = graft.core.Tables.eventsStream(spark, sfDir)
    val q = EventPipeline.resampleStream(stream)
      .writeStream.format("memory").queryName("sresample_real")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      import spark.implicits._
      val streamed = spark.table("sresample_real")
        .as[(Long, Long, Long, Double, Boolean)].collect().sorted.toSeq
      val batchRows = graft.ops.Resample.forwardFill(
          graft.core.Tables.events(spark, sfDir),
          col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("bkt_us", unix_micros(col("bkt")))
        .withColumn("mx", max("bkt_us").over(
          org.apache.spark.sql.expressions.Window.partitionBy("key")))
        .where(col("bkt_us") < col("mx"))
        .select(col("key"), col("bkt_us"), col("n_events"),
          col("value"), col("filled"))
        .as[(Long, Long, Long, Double, Boolean)].collect().sorted.toSeq
      assert(streamed === batchRows)
      assert(streamed.nonEmpty)
    } finally q.stop()
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

  test("stateful streaming transitions match the batch lead window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // u1's a->b->a chain SPANS the batch break (the b->a edge needs
    // batch-1 state); u2 has a single event in each batch (one edge,
    // purely cross-batch); u3 emits nothing (one event total)
    val batch1 = Seq(
      (1L, ts(1), "a"), (1L, ts(2), "b"),
      (2L, ts(1), "x"),
      (3L, ts(1), "solo"))
    val batch2 = Seq(
      (1L, ts(3), "a"),
      (2L, ts(4), "y"))

    val stream = MemoryStream[(Long, Timestamp, String)]
    val events = stream.toDF().toDF("user_id", "ts", "event_type")
    val q = EventPipeline.transitionStream(events)
      .writeStream.format("memory").queryName("strans")
      .outputMode("append").start()
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("strans")
        .as[(Long, String, String)].collect().sorted.toSeq

      // batch twin: the lead-window pairing over the full event set
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_type")
      val batchPairs = (batch1 ++ batch2).toDF("user_id", "ts", "event_type")
        .select(col("user_id"), col("event_type").as("src"),
          lead("event_type", 1).over(w).as("dst"))
        .where(col("dst").isNotNull)
        .as[(Long, String, String)].collect().sorted.toSeq

      assert(streamed === batchPairs)
      // the cross-batch boundary did its job on both users
      assert(streamed.contains((1L, "b", "a")) &&
        streamed.contains((2L, "x", "y")))
    } finally q.stop()
  }

  test("stateful streaming resample matches the batch forward fill") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // u1: two events in hour 0 (last-by-(ts,id) picks v=2.0), a gap
    // at hour 1, then hour 2 ACROSS the batch break — closing hours
    // 0 and 1 needs batch-1 state; u2 has one event (nothing closes)
    val batch1 = Seq(
      (1L, 10L, ts(0, 10), 1.0), (1L, 11L, ts(0, 20), 2.0),
      (2L, 20L, ts(0, 5), 9.0))
    val batch2 = Seq((1L, 12L, ts(2, 30), 3.0))

    val stream = MemoryStream[(Long, Long, Timestamp, Double)]
    val events = stream.toDF().toDF("user_id", "event_id", "ts", "value")
    val q = EventPipeline.resampleStream(events)
      .writeStream.format("memory").queryName("sresample")
      .outputMode("append").start()
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("sresample")
        .as[(Long, Long, Long, Double, Boolean)].collect().sorted.toSeq

      // batch twin minus each key's still-open LAST bucket
      val all = (batch1 ++ batch2).toDF("user_id", "event_id", "ts", "value")
      val batchRows = graft.ops.Resample.forwardFill(all,
          col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("bkt_us", unix_micros(col("bkt")))
        .withColumn("mx", max("bkt_us").over(
          org.apache.spark.sql.expressions.Window.partitionBy("key")))
        .where(col("bkt_us") < col("mx"))
        .select(col("key"), col("bkt_us"), col("n_events"),
          col("value"), col("filled"))
        .as[(Long, Long, Long, Double, Boolean)].collect().sorted.toSeq

      assert(streamed === batchRows)
      // the gap hour was filled with the carried value
      assert(streamed.exists { case (u, _, n, v, f) =>
        u == 1L && n == 0L && v == 2.0 && f })
    } finally q.stop()
  }

  test("stateful streaming funnel matches the batch window chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // u1 completes ACROSS the batch break (purchase arrives later);
    // u2's click precedes its view (must not count); u3 views only;
    // u4 purchases before clicking (stage 3 unreachable)
    val batch1 = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"),
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      (3L, ts(1), "view"),
      (4L, ts(1), "view"), (4L, ts(2), "purchase"))
    val batch2 = Seq(
      (1L, ts(3), "purchase"),
      (2L, ts(3), "click"),
      (4L, ts(3), "click"))

    val stream = MemoryStream[(Long, Timestamp, String)]
    val events = stream.toDF().toDF("user_id", "ts", "event_type")
    val q = EventPipeline.funnelStream(events)
      .writeStream.format("memory").queryName("sfunnel")
      .outputMode("append").start()
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val maxStage = spark.table("sfunnel")
        .groupBy("user_id").agg(max("stage").as("s"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

      // batch twin: the window-chain funnel over the full event set
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
      val batchStages = (batch1 ++ batch2).toDF("user_id", "ts", "event_type")
        .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t2", min(when(col("event_type") === "click" && col("ts") > col("t1"), col("ts"))).over(w))
        .withColumn("t3", min(when(col("event_type") === "purchase" && col("ts") > col("t2"), col("ts"))).over(w))
        .select("user_id", "t1", "t2", "t3").distinct()
        .collect().map(r => r.getLong(0) ->
          (if (r.get(3) != null) 3 else if (r.get(2) != null) 2
           else if (r.get(1) != null) 1 else 0)).toMap

      assert(maxStage === batchStages.filter(_._2 > 0))
      // the cross-batch boundary did its job: u1's purchase in batch 2
      // advanced the state built in batch 1
      assert(maxStage(1L) === 3)
    } finally q.stop()
  }

  test("stateful streaming attribution matches the batch window pick") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // u1's purchase lands in batch 2 but must credit the batch-1
    // click (cross-batch state); u2 purchases FIRST (no credit), then
    // touches and purchases again (credited); u3 never purchases
    val batch1 = Seq(
      (1L, 10L, ts(1), "view"), (1L, 11L, ts(2), "click"),
      (2L, 20L, ts(1), "purchase"), (2L, 21L, ts(2), "click"),
      (3L, 30L, ts(1), "view"))
    val batch2 = Seq(
      (1L, 12L, ts(3), "purchase"),
      (2L, 22L, ts(4), "purchase"))

    val stream = MemoryStream[(Long, Long, Timestamp, String)]
    val events = stream.toDF().toDF("user_id", "event_id", "ts", "event_type")
    val q = EventPipeline.attributionStream(events)
      .writeStream.format("memory").queryName("sattr")
      .outputMode("append").start()
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("sattr")
        .as[(Long, Long, Long, String, Long)].collect().sorted.toSeq

      // batch twin: the [unbounded, -1) ignoreNulls window pick
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      def prior(c: org.apache.spark.sql.Column) =
        last(when(col("event_type") =!= "purchase", c), ignoreNulls = true)
          .over(w)
      val batchRows = (batch1 ++ batch2)
        .toDF("user_id", "event_id", "ts", "event_type")
        .select(col("event_id"), col("user_id"), col("event_type"),
          prior(col("event_id")).as("attr_event_id"),
          prior(col("event_type")).as("attr_type"),
          prior(unix_micros(col("ts"))).as("attr_tsu"),
          unix_micros(col("ts")).as("tsu"))
        .where(col("event_type") === "purchase" &&
          col("attr_event_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("attr_event_id"),
          col("attr_type"), (col("tsu") - col("attr_tsu")).as("gap_us"))
        .as[(Long, Long, Long, String, Long)].collect().sorted.toSeq

      assert(streamed === batchRows)
      // cross-batch credit happened; the uncredited purchase is absent
      assert(streamed.exists(r => r._1 == 12L && r._3 == 11L))
      assert(!streamed.exists(_._1 == 20L))
    } finally q.stop()
  }

  test("stream-stream interval self-join matches the batch range join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int, sec: Int = 0) =
      Timestamp.valueOf(f"2024-01-01 00:$m%02d:$sec%02d")
    // u1: three events inside one 10-min window (3 pairs), one far
    // outside (no pair); u2: boundary-exact gap (= tol, kept) and a
    // tie (one canonical pair); pairs must also form ACROSS batches
    val batch1 = Seq(
      (1L, 100L, ts(0)), (1L, 101L, ts(3)),
      (2L, 200L, ts(0)), (2L, 201L, ts(10)),      // gap == tol exactly
      (2L, 202L, ts(10)), (3L, 300L, ts(1)))      // 201/202 tie
    val batch2 = Seq(
      (1L, 102L, ts(8)),                           // pairs with 100, 101
      (1L, 103L, ts(40)))                          // out of range of all

    val stream = MemoryStream[(Long, Long, Timestamp)]
    val events = stream.toDF().toDF("user_id", "event_id", "ts")
    val q = EventPipeline.rangeJoinStream(events)
      .writeStream.format("memory").queryName("srange")
      .outputMode("append").start()
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("srange")
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq

      val batchPairs = graft.ops.RangeJoin.selfWithin(
          (batch1 ++ batch2).toDF("user_id", "event_id", "ts"),
          col("user_id"), col("ts"), col("event_id"), 600L * 1000000L)
        .select("key", "id_a", "id_b", "gap_us")
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq

      assert(streamed === batchPairs)
      // the shapes that matter actually occurred
      assert(streamed.contains((2L, 200L, 201L, 600000000L)), "gap == tol")
      assert(streamed.contains((2L, 201L, 202L, 0L)), "tie once, canonical")
      assert(streamed.exists(r => r._2 == 100L && r._3 == 102L),
        "cross-batch pair")
      assert(!streamed.exists(r => r._2 == 103L || r._3 == 103L))
    } finally q.stop()
  }

  test("streaming extent dedup flags the batch incremental face's docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    val corpusWin = graft.ops.Dedup.exactSubstrWindows(
      corpus, col("text"), col("doc_id"))
    // arriving: one doc embedding a ≥12-token slice of a corpus doc
    // inside novel filler, one fully-novel doc; split across TWO
    // micro-batches with a second copy-carrier in batch 2
    val slice0 = corpus.where(col("doc_id") === 0L)
      .select(col("text")).head().getString(0)
      .split(" ").take(20).mkString(" ")
    val novel = (1 to 30).map(i => s"novelword$i").mkString(" ")
    val b1 = Seq((5000L, s"$novel $slice0"), (5001L, novel))
    val b2 = Seq((5002L, s"$slice0 $novel"))
    val stream = MemoryStream[(Long, String, Timestamp)]
    val docs = stream.toDF().toDF("doc_id", "text", "ts")
    val q = EventPipeline.extentDedupStream(docs, "text", "doc_id", "ts",
        corpusWin)
      .writeStream.format("memory").queryName("extdedup")
      .outputMode("append").start()
    try {
      val t = Timestamp.valueOf("2024-01-01 00:00:00")
      stream.addData(b1.map { case (i, s) => (i, s, t) }: _*)
      q.processAllAvailable()
      stream.addData(b2.map { case (i, s) => (i, s, t) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("extdedup").select("doc_id")
        .as[Long].collect().toSet
      // the batch face over the same arriving rows flags the same set
      val batch = graft.ops.Dedup.exactSubstrIncremental(
          (b1 ++ b2).toDF("doc_id", "text"), corpus,
          col("text"), col("doc_id"))
        .select("b").as[Long].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(5000L, 5002L))
    } finally q.stop()
  }
}
