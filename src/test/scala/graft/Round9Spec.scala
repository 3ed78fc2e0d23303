package graft

import org.apache.spark.sql.functions._
import graft.ops.{HeavyHitters, Salt, Similarity, TextAnalysis}

/** Round-9 operators: unicode normalization, exact heavy hitters,
  * salted join, ANN recall evaluation, rolling-median/lag windows.
  */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  // ---- text normalization --------------------------------------------

  test("normalize: NFC composes, accents strip, whitespace collapses") {
    // "Café" (decomposed) and "Café" (composed) must normalize
    // to the same digest; accents drop; runs of whitespace collapse
    val df = Seq(
      (1L, "Café  au   lait"),
      (2L, "Café au lait"),
      (3L, "CAFE au\tlait"),
      (4L, "  cafe au lait  ")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.normalize(df, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === out(2L)) // NFD/NFC forms converge
    assert(out(1L) === out(3L)) // case + accent + tab
    assert(out(1L) === out(4L)) // trim
  }

  test("normalize: normText is idempotent and length matches") {
    val df = Seq((1L, "  Á  b  ")).toDF("doc_id", "text")
    val once = df.select(TextAnalysis.normText(col("text")).as("n"))
    val twice = once.select(TextAnalysis.normText(col("n")).as("n"))
    assert(once.head.getString(0) === twice.head.getString(0))
    assert(once.head.getString(0) === "a b")
  }

  test("normalize: null text yields null digest, no throw") {
    val df = Seq((1L, "x"), (2L, null)).toDF("doc_id", "text")
    val out = TextAnalysis.normalize(df, col("text"), col("doc_id"))
      .orderBy("doc_id").collect()
    assert(out.length === 2 && out(1).isNullAt(1))
  }

  // ---- heavy hitters --------------------------------------------------

  test("heavy hitters equal the exact GROUP BY..HAVING on a skewed stream") {
    // planted zipf-ish stream: token i appears ~ N/i times
    val rows = (1 to 40).flatMap(i => Seq.fill(1200 / i)(s"tok$i"))
    val df = rows.toDF("item").repartition(7) // many partitions: the MG
    // union must still be a superset across arbitrary splits
    val k = 12
    val got = HeavyHitters.heavyHitters(df, col("item"), k)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = rows.size
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }
      .toSeq.map { case (t, c) => (t, c) }
      .sortBy { case (t, c) => (-c, t) }
    assert(got.toSeq === want)
  }

  test("misra-gries summary retains every local item above n/k") {
    val stream = Seq.fill(50)("hot") ++ (1 to 200).map(i => s"cold$i")
    val survivors =
      HeavyHitters.misraGries(scala.util.Random.shuffle(stream).iterator, 10)
        .toSet
    assert(survivors.contains("hot")) // 50 > 250/10
  }

  // ---- salted join ----------------------------------------------------

  test("salted join equals the plain equi-join on a planted hot key") {
    val fact = ((1 to 3000).map(i => (7L, i.toLong)) ++ // hot key
      (1 to 500).map(i => ((i % 20).toLong, i.toLong)))
      .toDF("fk", "v")
    val dim = (0L to 20L).map(kk => (kk, s"d$kk")).toDF("dk", "name")
    val salted = Salt.saltedJoin(fact, dim, col("fk"), col("dk"),
        Seq("v" -> col("v")), Seq("name" -> col("name")),
        saltFrom = col("v"), buckets = 8)
      .groupBy("key", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val plain = fact.join(dim, col("fk") === col("dk"))
      .groupBy(col("fk").as("key"), col("name"))
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(salted.orderBy("key").collect().toSeq ===
      plain.orderBy("key").collect().toSeq)
  }

  // ---- recall eval ----------------------------------------------------

  test("recallEval agrees with a hand comparison of the two routes") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 10)
    val ev = Similarity.recallEval(emb, q, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toList
    assert(ev.map(_._1) === (0L to 9L).toList)
    val approx = Similarity.lshTopKPortable(emb, q, 5)
      .select(col("qid"), col("nbr"), col("rnk").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = Similarity.bruteTopK(emb, q, 5)
      .select(col("qid"), col("nbr"), col("rnk").cast("long")).collect()
      .groupBy(_.getLong(0))
    for ((qid, hits, rankTop1) <- ev) {
      val ex = exact(qid).map(r => (r.getLong(1), r.getLong(2)))
      assert(hits === ex.count { case (nbr, _) => approx.contains((qid, nbr)) })
      val top1 = ex.find(_._2 == 1L).get._1
      assert(rankTop1 === approx.getOrElse((qid, top1), 0L))
      assert(hits >= 0L && hits <= 5L)
    }
    // the LSH recall gate the operator exists to measure
    val totalHits = ev.map(_._2).sum
    assert(totalHits >= 45L, s"recall@5 dropped: $totalHits/50")
  }

  // ---- two-phase global cumulative sum -----------------------------------

  test("globalCumSum equals the single-partition window spelling") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val df = (1 to 2000).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "v").repartition(7)
    val got = graft.ops.Rank.globalCumSum(df,
        Seq(desc("v"), asc("k")), col("v"), "cum")
      .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = df.withColumn("cum",
        sum("v").over(Window.orderBy(desc("v"), asc("k"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naive)
    // the FUSED rank+cumsum agrees with both single-purpose helpers
    val fused = graft.ops.Rank.globalRankCumSum(df,
        Seq(desc("v"), asc("k")), col("v"), "rnk", "cum")
      .select("k", "rnk", "cum").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rankOnly = graft.ops.Rank.globalRank(df,
        Seq(desc("v"), asc("k")), "rnk")
      .select("k", "rnk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.view.mapValues(_._2).toMap === naive)
    assert(fused.view.mapValues(_._1).toMap === rankOnly)
  }

  // ---- token-budgeted sampling ------------------------------------------

  test("token budget: overshoot is less than one doc, replay exact") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val take = graft.ops.Curation.sampleTokenBudget(
      docs, col("source"), col("doc_id"), col("text"), 120L)
    val got = take.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // per source: every taken doc started under budget; the total
    // overshoots by strictly less than the last doc's length
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.forall(_._4 < 120L))
      val total = rows.map(_._3).sum
      val maxDoc = rows.map(_._3).max
      assert(total < 120L + maxDoc)
    }
    // deterministic: the same call reproduces the same sample
    val again = graft.ops.Curation.sampleTokenBudget(
      docs, col("source"), col("doc_id"), col("text"), 120L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(again.toSeq === got.map(t => (t._1, t._2)).toSeq)
  }

  test("token budget: null text counts zero tokens, never drops the doc") {
    val df = Seq((1L, "a b c", "s"), (2L, null, "s"), (3L, "d e", "s"))
      .toDF("doc_id", "text", "source")
    val got = graft.ops.Curation.sampleTokenBudget(
      df, col("source"), col("doc_id"), col("text"), 100L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(2L) === 0L)
  }

  // ---- phash near-dup mining -------------------------------------------

  test("phash near-dup banding is lossless at hamming <= 15") {
    // 16 bands x 4 bits: 15 differing bits cannot touch all 16 bands,
    // so every pair at dist <= 15 shares a band — banded == brute
    val rnd = new scala.util.Random(7)
    val baseHashes = Seq.fill(40)(rnd.nextLong())
    // planted near pairs at distances 1, 7, 15 (kept) and 16 (cut)
    def flip(h: Long, k: Int): Long = {
      val bits = rnd.shuffle((0 until 64).toList).take(k)
      bits.foldLeft(h)((x, b) => x ^ (1L << b))
    }
    val all = (baseHashes ++ Seq(flip(baseHashes.head, 1),
      flip(baseHashes(1), 7), flip(baseHashes(2), 15),
      flip(baseHashes(3), 16))).distinct
    def hex(h: Long) = f"$h%016x"
    val df = all.zipWithIndex
      .map { case (h, i) => (i.toLong, hex(h)) }.toDF("doc_id", "phash")
    val got = graft.ops.Multimodal.phashNearDups(df, maxHamming = 15)
      .select("a_hash", "b_hash", "dist").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = (for {
      a <- all; b <- all if hex(a) < hex(b)
      d = java.lang.Long.bitCount(a ^ b) if d <= 15
    } yield (hex(a), hex(b), d.toLong)).toSet
    assert(got === want)
    assert(want.exists(_._3 == 15L)) // the planted boundary pair survives
    assert(!got.exists(_._3 > 15L))
  }

  // ---- rolling median -------------------------------------------------

  test("rolling median pair brackets the window's sorted middle") {
    val rows = Seq(
      (1L, 10L, "2024-01-01 00:00:00", 5.0),
      (2L, 10L, "2024-01-01 00:01:00", 1.0),
      (3L, 10L, "2024-01-01 00:02:00", 9.0),
      (4L, 10L, "2024-01-01 00:03:00", 3.0)
    ).toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-8, 0)
    val out = rows
      .select(col("event_id"), round(col("value") * 1e6).cast("long").as("mv"))
      .withColumn("win", array_sort(collect_list("mv").over(
        Window.partitionBy(lit(1)).orderBy("event_id").rowsBetween(-8, 0))))
      .select(col("event_id"),
        element_at(col("win"), expr("(size(win)+1) div 2").cast("int"))
          .as("lo"),
        element_at(col("win"), expr("size(win) div 2 + 1").cast("int"))
          .as("hi"))
      .orderBy("event_id").collect()
    // windows: [5] [1,5] [1,5,9] [1,3,5,9]
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq(
      (5000000L, 5000000L), (1000000L, 5000000L),
      (5000000L, 5000000L), (3000000L, 5000000L)))
  }
}
