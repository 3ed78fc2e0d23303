package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints + duplicated-span pairs (SURVEY §2c.27c):
  * kernel checked against an independent reference spelling, the
  * SIGMOD'03 detection guarantee exercised structurally, and the
  * operator's planted-span recall asserted on the real corpus.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** independent O(m·w) reference winnow: same polynomial, rightmost
    * window-min per position, distinct sorted — the naive spelling of
    * what the incremental kernel computes
    */
  private def refWinnow(text: String, k: Int, w: Int): Seq[Long] = {
    val bytes = text.getBytes("UTF-8")
    val n = bytes.length
    if (n == 0) return Seq.empty
    val kk = math.min(k, n)
    val B = 1000003L
    val bpow = (0 until kk).foldLeft(1L)((p, _) => p * B)
    val hs = new Array[Long](n - kk + 1)
    var h = 0L
    for (i <- 0 until n) {
      h = h * B + (bytes(i) & 0xffL)
      if (i >= kk) h -= (bytes(i - kk) & 0xffL) * bpow
      if (i >= kk - 1) hs(i - kk + 1) = h
    }
    val m = hs.length
    val sel = scala.collection.mutable.SortedSet.empty[Long]
    if (m <= w) {
      sel += hs.reduceLeft((a, b) =>
        if (java.lang.Long.compareUnsigned(b, a) <= 0) b else a)
    } else {
      for (start <- 0 to m - w) {
        var min = start
        for (j <- start + 1 until start + w)
          if (java.lang.Long.compareUnsigned(hs(j), hs(min)) <= 0) min = j
        sel += hs(min)
      }
    }
    sel.toSeq
  }

  private def kernelWinnow(text: String, k: Int, w: Int): Seq[Long] =
    graft.functions.TextHash.winnow(UTF8String.fromString(text), k, w)
      .toLongArray().toSeq

  test("kernel matches the independent reference winnow") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh "
    for (len <- Seq(0, 1, 5, 15, 16, 17, 23, 50, 500, 3000)) {
      val s = (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(kernelWinnow(s, 16, 8) === refWinnow(s, 16, 8), s"len=$len")
      assert(kernelWinnow(s, 4, 3) === refWinnow(s, 4, 3), s"len=$len k=4")
    }
  }

  test("winnowed set is a subset of the full k-gram hash stream, ~2/(w+1) dense") {
    val rnd = new scala.util.Random(7)
    val s = (0 until 4000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val k = 16; val w = 8
    val bytes = s.getBytes("UTF-8")
    val B = 1000003L
    val bpow = (0 until k).foldLeft(1L)((p, _) => p * B)
    val all = scala.collection.mutable.Set.empty[Long]
    var h = 0L
    for (i <- bytes.indices) {
      h = h * B + (bytes(i) & 0xffL)
      if (i >= k) h -= (bytes(i - k) & 0xffL) * bpow
      if (i >= k - 1) all += h
    }
    val sel = kernelWinnow(s, k, w).toSet
    assert(sel.subsetOf(all))
    val density = sel.size.toDouble / all.size
    // expected 2/(w+1) ≈ 0.22 on random input; wide tolerance — the
    // claim under test is "a small sample", not the exact constant
    assert(density > 0.05 && density < 0.5, s"density $density")
  }

  test("SIGMOD'03 guarantee: a shared span of w+k-1 bytes shares a fingerprint") {
    val k = 16; val w = 8
    val rnd = new scala.util.Random(1234)
    def randText(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // 200 random trials: a minimal-length shared span spliced into
    // otherwise-independent noise at random offsets must ALWAYS yield
    // a common selected fingerprint — the guarantee is structural
    // (every window's min value is selected; a span of w+k-1 bytes is
    // one full window of w identical k-gram hashes in both docs)
    for (trial <- 0 until 200) {
      val span = randText(w + k - 1)
      val a = randText(rnd.nextInt(100)) + span + randText(rnd.nextInt(100))
      val b = randText(rnd.nextInt(100)) + span + randText(rnd.nextInt(100))
      val common = kernelWinnow(a, k, w).toSet & kernelWinnow(b, k, w).toSet
      assert(common.nonEmpty, s"trial $trial: no shared fingerprint")
    }
  }

  test("substringPairs catches a pasted span that whole-doc jaccard misses") {
    val rnd = new scala.util.Random(99)
    def words(n: Int) =
      (0 until n).map(_ => (0 until 6).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
        .mkString(" ")
    val span = "this exact boilerplate paragraph was pasted between documents verbatim"
    val docs = Seq(
      (0L, words(300) + " " + span + " " + words(300)),
      (1L, words(300) + " " + span + " " + words(300)),
      (2L, words(600))
    ).toDF("doc_id", "text")
    val spanPairs = Dedup.substringPairs(docs, col("text"), col("doc_id"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(spanPairs === Set((0L, 1L)))
    // the whole-doc exact-jaccard operator does NOT see this pair:
    // ~70 shared bytes in ~2×2600-byte docs is ~1% similarity
    val jacc = Dedup.ngramJaccard(docs, col("text"), col("doc_id"), minJaccard = 0.3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(jacc.isEmpty)
  }

  test("planted span-dups are all recovered on the real corpus") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val planted = Dedup.plantSpanDups(corpus)
    val expected = corpus.where(col("doc_id") % 20 === 0)
      .select(col("doc_id")).as[Long].collect()
      .map(i => (i, i + 2000000L)).toSet
    val found = Dedup.substringPairs(planted, col("text"), col("doc_id"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    // structural recall: every planted (src, copy) pair shares a
    // 240-byte span ≫ w+k-1 = 23 bytes → always detected
    assert(expected.subsetOf(found),
      s"missing ${(expected -- found).take(5)} of ${expected.size}")
    // PRECISION, string-level (no hashes): every reported pair —
    // planted or organic (the corpus has exact/near dups) — must
    // actually share a ≥16-byte substring. A shared winnowed hash is
    // a shared k-gram unless two distinct 16-grams collide in 64
    // bits; this check would expose exactly that false positive.
    val texts = planted.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    found.foreach { case (a, b) =>
      val grams16 = texts(a).sliding(16).toSet
      assert(texts(b).sliding(16).exists(grams16.contains),
        s"pair ($a,$b) reported but shares no 16-byte substring")
    }
  }

  test("span-dup fraction: exact dups 1.0, novel docs 0.0, pasted span in between") {
    val rnd = new scala.util.Random(5)
    def words(n: Int) =
      (0 until n).map(_ => (0 until 6).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
        .mkString(" ")
    val span = "the shared boilerplate passage that was pasted into both documents"
    val same = words(200)
    val docs = Seq(
      (0L, same),                                   // exact dup of 1
      (1L, same),
      (2L, words(100) + " " + span + " " + words(100)), // partial copy of 3
      (3L, words(100) + " " + span + " " + words(100)),
      (4L, words(200))                              // fully novel
    ).toDF("doc_id", "text")
    val r = Dedup.spanDupStats(docs, col("text"), col("doc_id"))
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(0L) === 1.0)
    assert(r(1L) === 1.0)
    assert(r(4L) === 0.0)
    assert(r(2L) > 0.0 && r(2L) < 0.5, s"partial copy fraction ${r(2L)}")
    assert(r(2L) === r(3L) || math.abs(r(2L) - r(3L)) < 0.2)
  }

  test("null and empty texts drop out of the span family without errors") {
    val docs = Seq(
      (0L, "a normal document with enough text to fingerprint reliably here"),
      (1L, null.asInstanceOf[String]),
      (2L, "")
    ).toDF("doc_id", "text")
    assert(Dedup.substringPairs(docs, col("text"), col("doc_id")).count() === 0)
    val ids = Dedup.spanDupStats(docs, col("text"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(0L)) // null text → null fps; empty → empty set
  }

  test("identical docs share their full fingerprint set") {
    val docs = Seq(
      (0L, "the same document text repeated here for the exact dup case entirely"),
      (1L, "the same document text repeated here for the exact dup case entirely")
    ).toDF("doc_id", "text")
    val nFps = kernelWinnow(
      "the same document text repeated here for the exact dup case entirely", 16, 8).size
    val r = Dedup.substringPairs(docs, col("text"), col("doc_id"), minShared = 1)
      .collect()
    assert(r.length === 1)
    assert(r.head.getLong(2) === nFps.toLong)
  }
}
