package graft

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** The test corpus has no nulls; real corpora do. Text/dedup
  * operators must degrade gracefully (drop or null-mark), never throw.
  */
class NullRobustnessSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, Some("normal document text here")),
    (1L, None),
    (2L, Some("")),
    (3L, Some("   ")),
    (4L, Some("normal document text here"))
  ).toDF("doc_id", "text")

  test("exact dedup: null and empty texts form their own groups") {
    val g = Dedup.exact(docs, col("text"), col("doc_id")).collect()
    // 0 and 4 collapse; null hashes to null group; "" and "   " distinct
    val dup = g.filter(_.getLong(1) == 2)
    assert(dup.length === 1 && dup.head.getLong(2) === 0L)
  }

  test("ngram jaccard ignores null/empty docs without throwing") {
    val pairs = Dedup.ngramJaccard(docs, col("text"), col("doc_id"), minJaccard = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 4L)))
  }

  test("text analysis yields null-safe rows for null/empty text") {
    val q = TextAnalysis.quality(docs, col("text"), col("doc_id"))
      .orderBy("doc_id").collect()
    assert(q.length === 5)
    assert(q(1).isNullAt(1) || q(1).isNullAt(5)) // null text → null measures
    val tc = TextAnalysis.tokenCounts(docs, col("text"), col("doc_id")).count()
    assert(tc === 5)
    val li = TextAnalysis.langId(docs, col("text"), col("doc_id"))
      .orderBy("doc_id").collect()
    assert(li.length === 5)
  }

  test("portable minhash/simhash families survive null/empty text") {
    // null text → no shingles/tokens → the doc silently drops from
    // both portable pipelines (same contract as the xxhash twins and
    // their DuckDB oracles); no query may throw
    val mh = Dedup.minhashLshPortable(docs, col("text"), col("doc_id"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(mh === Set((0L, 4L))) // only the genuine dup pair
    val sh = Dedup.simhashPortablePairs(docs, col("text"), col("doc_id"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    // identical docs are hamming-0; null drops; ""/"   " tokenize to
    // [""] / ["","",""] - distinct - sets whose fingerprints may or
    // may not collide with each other, but must never throw
    assert(sh.contains((0L, 4L)))
    assert(sh.forall { case (a, b) => a != 1L && b != 1L })
  }

  test("asof tolerance tolerates null left times") {
    import java.sql.Timestamp
    val left = Seq(
      (1L, "A", Some(Timestamp.valueOf("2024-01-01 10:00:05"))),
      (2L, "A", None)
    ).toDF("id", "k", "t")
    val right = Seq(("A", Timestamp.valueOf("2024-01-01 10:00:00"), 1.0))
      .toDF("k", "rt", "v")
    val res = graft.ops.AsOf.join(left, col("k"), col("t"),
        right, col("k"), col("rt"), Seq("v" -> col("v")),
        toleranceTicks = Some(60L * 1000000))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(res(1L) === Some(1.0))
    assert(res(2L) === None) // null time → no match, row kept
  }

  test("simhash and fingerprints survive null/empty text") {
    assert(Dedup.simhash(docs, col("text"), col("doc_id")).count() <= 5)
    assert(TextAnalysis.fingerprint(docs, col("text"), col("doc_id")).count() === 5)
    assert(TextAnalysis.rollingFingerprint(docs, col("text"), col("doc_id")).count() === 5)
  }

  test("repetition and sharding degrade gracefully on null/empty text") {
    val r = TextAnalysis.repetition(docs, col("text"), col("doc_id"))
      .orderBy("doc_id").collect()
    assert(r.length === 5)
    assert(r(1).isNullAt(1)) // null text → null dup fraction, no throw
    assert(r(1).getDouble(2) === 0.0)
    val s = graft.ops.Sharding.tokenBudgeted(docs, col("text"), col("doc_id"),
      lit("all"), 4L)
    assert(s.count() >= 1) // no throw; null-token docs pass through
    // contextChunks: a null text yields null ntok, which the ntok > 0
    // filter drops BUT whose null contribution to the running sum
    // would otherwise poison every later offset — assert the non-null
    // docs still chunk correctly after a null in stream order
    val c = graft.ops.Sharding.contextChunks(docs, col("text"),
      col("doc_id"), lit("all"), 4L).collect()
    assert(c.nonEmpty)
    assert(c.map(_.getLong(4)).sum > 0) // token fill survives
    // embedding group stats: null embeddings explode to no rows
    val e = Seq((0L, Some(Array(1f, 2f))), (1L, None))
      .toDF("vec_id", "embedding")
    val g = graft.ops.Similarity.groupStats(e, col("vec_id") % 2).collect()
    assert(g.length === 2 && g.forall(_.getLong(2) === 1L))
  }

  test("curation ops tolerate null/empty text and null strata") {
    import graft.ops.Curation
    // null text → no shingles → simply absent from contamination
    val c = Curation.contaminated(docs, col("text"), col("doc_id"),
      col("doc_id") === 0L, k = 2)
    assert(c.count() >= 0) // no throw; planted eval text too short anyway
    // null scrub input → null scrubbed output, not a crash
    val p = Curation.piiScrub(docs, col("text"), col("doc_id"))
      .orderBy("doc_id").collect()
    assert(p.length === 5 && p(1).isNullAt(1))
    // null stratum forms its own group in both samplers
    val strat = Seq((0L, Some("s1")), (1L, None), (2L, None))
      .toDF("doc_id", "source")
    assert(Curation.sampleStratified(strat, col("source"), col("doc_id"), 1)
      .count() === 2) // one per stratum incl. the null stratum
    assert(Curation.sampleMixture(strat, col("source"), col("doc_id"))
      .count() === 3) // quota >= 1 per stratum keeps all here
  }

  test("bloom decontamination, bigram signals and cross dedup survive nulls") {
    import graft.ops.Curation
    // null/empty texts have no shingles — absent from hits, no throw
    // (eval side includes the null-text doc on purpose)
    assert(Curation.contaminatedBloom(docs, col("text"), col("doc_id"),
      col("doc_id").isin(0L, 1L), k = 2).count() >= 0)
    // null text → null token array → filtered before bigram explode;
    // "" → [""] (1 token) filtered; "   " → 4 empty tokens, which DO
    // form (degenerate) bigrams — same tokenizer contract as quality
    val b = TextAnalysis.bigramNovelty(docs, col("text"), col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(b === Set(0L, 3L, 4L))
    // null-signature docs are dropped on BOTH sides of the cross join
    val x = Dedup.minhashLshCross(docs.where(col("doc_id") >= 3),
      docs.where(col("doc_id") < 3), col("text"), col("doc_id"))
    assert(x.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((4L, 0L))) // the surviving exact pair across the split
  }

  test("decodeImages tolerates null payload bytes") {
    val p = Seq((0L, Some(Array[Byte](1, 2, 3))), (1L, None))
      .toDF("doc_id", "payload")
    val d = graft.ops.Multimodal.decodeImages(p).orderBy("doc_id").collect()
    assert(d.length === 2)
    assert(d(1).getInt(1) === 16) // null payload → empty-byte stub fallback
  }

  test("round-9 text/ML ops survive null/empty text and labels") {
    // portable rolling fingerprint: null coalesces to '' — rows for all
    val rfp = TextAnalysis.rollingFingerprintPortable(
      docs, col("text"), col("doc_id")).collect()
    assert(rfp.length === 5 && rfp.forall(!_.isNullAt(1)))
    // collocations: null/empty docs contribute no bigrams, no throw
    assert(TextAnalysis.collocations(docs, col("text"),
      minCount = 1L).count() >= 1)
    // naive bayes: a null-text doc still gets a prediction row (all
    // class scores null → tie broken on class name identically)
    val nb = TextAnalysis.naiveBayesConfusion(
      docs.withColumn("lang", when(col("doc_id") < 2, "a").otherwise("b")),
      col("text"), col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(2)).sum
    assert(nb === 5L)
    // classifier (integer micro score): null text → zero tokens row
    // is absent from the explode; remaining docs all score
    val clf = TextAnalysis.linearClassifier(docs, col("text"), col("doc_id"))
    assert(clf.count() >= 3)
  }

  test("round-9 continuation ops survive null text/strata") {
    val d2 = docs
      .withColumn("source", when(col("doc_id") === 1L, lit(null)
        .cast("string")).otherwise(lit("s")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    // length batching: null text → null ntok sorts after real docs
    // (desc = nulls last); every doc keeps a batch row, no throw
    val lb = graft.ops.Sharding.lengthBatches(
      d2, col("text"), col("doc_id"), col("source"), 2L).collect()
    assert(lb.map(_.getLong(2)).sum === 5L)
    // interleave: a null stratum is a legitimate group (null-safe
    // quota join contract shared with sampleMixture); all docs
    // scheduled exactly once
    val il = graft.ops.Curation.interleave(
      d2, col("source"), col("doc_id"), take = 100).collect()
    assert(il.length === 5)
    assert(il.map(_.getLong(2)).sorted === (0L to 4L).toArray)
    // survivor: null-text docs have no shingles → no pairs; the one
    // genuine dup pair resolves on (n_chars, id) with no throw even
    // when other docs carry null lengths
    val pairsBacked = {
      val len = d2.select(col("doc_id"), col("n_chars"))
      val pairs = Dedup.ngramJaccard(d2, col("text"), col("doc_id"))
      pairs
        .join(len.withColumnRenamed("doc_id", "a")
          .withColumnRenamed("n_chars", "la"), "a")
        .join(len.withColumnRenamed("doc_id", "b")
          .withColumnRenamed("n_chars", "lb"), "b")
        .select(
          when(col("la") > col("lb"), col("b"))
            .when(col("la") < col("lb"), col("a"))
            .otherwise(greatest(col("a"), col("b"))).as("doc_id"),
          when(col("la") > col("lb"), col("a"))
            .when(col("la") < col("lb"), col("b"))
            .otherwise(least(col("a"), col("b"))).as("winner"))
        .collect()
    }
    assert(pairsBacked.length === 1)
    assert(pairsBacked.head.getLong(0) === 4L &&
      pairsBacked.head.getLong(1) === 0L)
  }

  test("round-9 window/join ops survive null values and null keys") {
    // null value → null mv: lag deltas go null but rows still emit,
    // rolling min/max skip the null (Spark agg-over-window contract)
    val ev = Seq(
      (1L, 7L, "2024-01-01 00:00:00", Some(1.0)),
      (2L, 7L, "2024-01-01 00:01:00", None),
      (3L, 7L, "2024-01-01 00:02:00", Some(3.0)),
      (4L, 7L, "2024-01-01 00:03:00", Some(2.0))
    ).toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val lagged = ev
      .select(col("event_id"),
        round(col("value") * 1e6).cast("long").as("mv"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(lit(1)).orderBy("event_id")))
      .withColumn("d1", col("mv") - lag("mv", 1).over(
        Window.partitionBy(lit(1)).orderBy("event_id")))
      .where(col("rn") >= 3)
      .collect()
    assert(lagged.length === 2)
    assert(lagged.head.isNullAt(3)) // 3.0 - null = null, no throw
    // heavy hitters: null items are skipped by the MG fold AND the
    // exact recount (count over a null-filtered candidate join)
    val hh = graft.ops.HeavyHitters.heavyHitters(
      Seq(Some("a"), Some("a"), Some("a"), None, Some("b"))
        .toDF("item"), col("item"), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(hh.toSeq === Seq(("a", 3L)))
    // salted join: null fact keys behave exactly like the plain join
    // (equi-join drops them) — result parity is the whole contract
    val fact = Seq((Some(1L), 10L), (None, 20L), (Some(2L), 30L))
      .toDF("fk", "v")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("dk", "name")
    val salted = graft.ops.Salt.saltedJoin(fact, dim,
        col("fk"), col("dk"), Seq("v" -> col("v")),
        Seq("name" -> col("name")), saltFrom = col("v"), buckets = 4)
      .select("key", "v", "name").collect().map(_.toSeq).toSet
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select(col("fk").as("key"), col("v"), col("name"))
      .collect().map(_.toSeq).toSet
    assert(salted === plain && salted.size === 2)
  }
}
