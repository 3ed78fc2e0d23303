package graft

import graft.core.Tables
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** ExactSubstr duplicated-extent dedup (SURVEY §2c.27i/27j — Lee et
  * al. 2022): the window-anchored distributed operator is proven
  * equal to an INDEPENDENT brute force — raw window-string candidate
  * pairing (no hashing) + a per-pair diagonal token scan (no windows,
  * no islands) — on the planted corpus, and the scrub face's
  * keep-lowest-doc semantics are pinned on constructed duplicates.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private val N = 12

  private def corpus = Dedup.plantSpanDups(Tables.documents(spark, sfDir))

  /** (doc_id → token array) collected once for the brute force */
  private lazy val toks: Map[Long, Array[String]] =
    corpus.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
      .toMap

  /** independent maximal-extent reference: candidate doc pairs from a
    * raw window-STRING map (exact, no md5), then for each pair every
    * alignment diagonal is token-scanned for maximal equal runs ≥ N.
    */
  private lazy val brute: Set[(Long, Long, Long, Long, Long)] = {
    val winMap = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.Set[Long]]
    toks.foreach { case (d, ts) =>
      var i = 0
      while (i + N <= ts.length) {
        winMap.getOrElseUpdate(ts.slice(i, i + N).mkString(" "),
          scala.collection.mutable.Set.empty[Long]) += d
        i += 1
      }
    }
    val cands = winMap.values.filter(_.size >= 2).flatMap { ds =>
      val s = ds.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }.toSet
    cands.flatMap { case (a, b) =>
      val (ta, tb) = (toks(a), toks(b))
      val out = scala.collection.mutable.ListBuffer
        .empty[(Long, Long, Long, Long, Long)]
      // diagonal d: a-position i aligns with b-position i - d
      for (d <- -(tb.length - 1) to (ta.length - 1)) {
        var i = math.max(0, d)
        val end = math.min(ta.length, tb.length + d)
        while (i < end) {
          if (ta(i) == tb(i - d)) {
            var j = i
            while (j < end && ta(j) == tb(j - d)) j += 1
            if (j - i >= N)
              out += ((a, b, i + 1L, (i - d) + 1L, (j - i).toLong))
            i = j
          }
          i += 1
        }
      }
      out
    }
  }

  test("extents equal an independent brute-force maximal-run scan") {
    // cap forced inactive: this pins the EXACT semantics; the query
    // row's production cap is the shared skew guard, spec'd in SkewSpec
    val got = Dedup.exactSubstrExtents(corpus, col("text"), col("doc_id"),
        minTokens = N, maxWindowFreq = Long.MaxValue)
      .select("a", "b", "a_start", "b_start", "len_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(brute.nonEmpty, "planted corpus must contain extents")
    assert(got === brute)
  }

  test("extent_md5 hashes text that appears IDENTICALLY in both docs") {
    val rows = Dedup.exactSubstrExtents(corpus, col("text"), col("doc_id"),
        minTokens = N, maxWindowFreq = Long.MaxValue).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (as, bs, len) =
        (r.getLong(2).toInt, r.getLong(3).toInt, r.getLong(4).toInt)
      val extA = toks(a).slice(as - 1, as - 1 + len).mkString(" ")
      val extB = toks(b).slice(bs - 1, bs - 1 + len).mkString(" ")
      assert(extA === extB, s"extent mismatch for ($a,$b)")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(extA.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md === r.getString(5))
    }
  }

  test("incremental extents equal the batch operator's cross pairs") {
    val aug = corpus
    val batch = aug.where(col("doc_id") >= 2000000L)
    val base = aug.where(col("doc_id") < 2000000L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSet
    val inc = rows(Dedup.exactSubstrIncremental(batch, base,
      col("text"), col("doc_id"), minTokens = N,
      maxWindowFreq = Long.MaxValue))
    // batch operator over the union, restricted to (corpus, batch)
    // pairs — ids are disjoint with corpus < batch, so a<b picks
    // exactly the cross orientation
    val full = rows(Dedup.exactSubstrExtents(aug, col("text"),
        col("doc_id"), minTokens = N, maxWindowFreq = Long.MaxValue))
      .filter(e => e._1 < 2000000L && e._2 >= 2000000L)
    assert(inc.nonEmpty)
    assert(inc === full)
  }

  test("scrub: keep-lowest-doc semantics on constructed duplicates") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma"
    val df = Seq(
      (1L, base),                       // keeper (lowest doc_id)
      (2L, base),                       // exact copy — fully scrubbed
      (3L, "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen") // novel — untouched
    ).toDF("doc_id", "text")
    val got = Dedup.exactSubstrScrub(df, col("text"), col("doc_id"),
        minTokens = N, maxWindowFreq = Long.MaxValue)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val nb = base.split(" ", -1).length.toLong
    assert(got(1L) === ((nb, 0L, md5hex(base))))        // keeper intact
    assert(got(2L) === ((nb, nb, md5hex(""))))          // copy fully gone
    assert(got(3L)._2 === 0L)                           // novel untouched
  }

  test("scrub and extents agree on WHO gets scrubbed") {
    val scrubbed = Dedup.exactSubstrScrub(corpus, col("text"),
        col("doc_id"), minTokens = N, maxWindowFreq = Long.MaxValue)
      .where(col("n_scrubbed") > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // a doc is scrubbed iff it shares a window with a SMALLER doc —
    // exactly the docs appearing on the b side of some extent
    val bDocs = brute.map(_._2)
    assert(scrubbed === bDocs)
  }
}
