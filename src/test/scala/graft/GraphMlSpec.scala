package graft

import graft.ops.{Curation, Embed, Graph, KMeans, Profile}
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Round-9 operators: PageRank, k-means, int8 quantization, negative
  * sampling, the linear quality classifier, and the correlation
  * matrix — invariant checks on constructed inputs (the cross-engine
  * hash evidence lives in the Verify/DuckDB gate; these pin the
  * operator-level semantics a hash can't name).
  */
class GraphMlSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: symmetric pair ranks equal, star center dominates") {
    // star: hub h connected to leaves l1..l4, plus an isolated pair
    val edges = Seq(("h", "l1"), ("h", "l2"), ("h", "l3"), ("h", "l4"),
      ("p", "q")).toDF("a", "b")
    val r = Graph.pageRank(edges, col("a"), col("b"), iterations = 5)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.size == 7)
    // symmetric positions must get identical ranks
    assert(r("p") == r("q"))
    assert(r("l1") == r("l2") && r("l2") == r("l3") && r("l3") == r("l4"))
    // the hub out-ranks its leaves
    assert(r("h") > r("l1"))
    // total rank is conserved up to the per-edge floor loss:
    // n·1e6 ≥ Σ ranks > n·1e6 − n_directed_edges·iterations
    val total = r.values.sum
    assert(total <= 7L * 1000000L)
    assert(total > 7L * 1000000L - 10L * 5L * 2L)
  }

  test("pageRankConverged: fixed-k prefix identical, converges, flags") {
    val edges = Seq(("h", "l1"), ("h", "l2"), ("h", "l3"), ("h", "l4"),
      ("p", "q")).toDF("a", "b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // epsilon 0 never converges early → exactly maxIterations rounds,
    // and the result must equal the fixed-iteration operator — for
    // BOTH checkpoint cadences (cadence must never change values)
    val fixed5 = asMap(Graph.pageRank(edges, col("a"), col("b"),
      iterations = 5))
    val (c1, n1) = Graph.pageRankConverged(edges, col("a"), col("b"),
      maxIterations = 5, epsilonMicro = 0L, checkpointEvery = 1)
    val (c3, n3) = Graph.pageRankConverged(edges, col("a"), col("b"),
      maxIterations = 5, epsilonMicro = 0L, checkpointEvery = 3)
    assert(n1 == 5 && n3 == 5)
    assert(asMap(c1) === fixed5)
    assert(asMap(c3) === fixed5)
    // convergence stops before the cap: the star's hub↔leaf
    // oscillation decays geometrically at the damping factor
    // (0.85ⁿ·1e6 ≤ 1000 micro at n ≈ 43), so with cap 60 the gate
    // must fire in the mid-40s — early, and well past the fixed-5
    // horizon the hash-oracled twin pins
    val (cv, nv) = Graph.pageRankConverged(edges, col("a"), col("b"),
      maxIterations = 60, epsilonMicro = 1000L)
    assert(nv < 60 && nv > 5, s"expected mid-range convergence, ran $nv")
    val rv = asMap(cv)
    assert(rv("p") == rv("q") && rv("h") > rv("l1"))
  }

  test("kmeans: separated blobs recover their blobs exactly") {
    // two tight blobs far apart; k=2, init = two lowest ids = one
    // per blob (ids interleaved so init starts one centroid in each)
    val vecs = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array(base + i * 1e-4f, base, base))
    }.toDF("vec_id", "embedding")
    val out = KMeans.assign(vecs, col("embedding"), col("vec_id"),
      k = 2, iterations = 3).collect()
    val byCluster = out.groupBy(_.getLong(1)).view.mapValues(
      _.map(_.getLong(0)).toSet).toMap
    assert(byCluster.size == 2)
    assert(byCluster.values.toSet ==
      Set((0L until 20L by 2).toSet, (1L until 20L by 2).toSet))
  }

  test("quantizeInt8: max-abs component codes to ±127, zero vector to 0") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Embed.quantizeInt8(vecs, col("embedding"), col("vec_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // vec 1: scale = 1e6; codes round(127·x) = [64, -127, 32]
    assert(out(1L) == ((1000000L, 3L, 64L + 127L + 32L)))
    assert(out(2L) == ((0L, 0L, 0L)))
  }

  test("sampleNegatives: circulant design — no self pairs, balanced usage") {
    val docs = (1L to 40L).map(i => (if (i <= 35) "a" else "b", i))
      .toDF("source", "doc_id")
    val out = Curation.sampleNegatives(docs, col("source"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getInt(2), r.getLong(3)))
    assert(out.forall { case (_, d, _, n) => d != n })
    // stratum a (35 docs, offsets 1/7/31 all < 35): 3 negatives per
    // doc, and every doc is USED as a negative exactly 3 times
    val a = out.filter(_._1 == "a")
    assert(a.groupBy(_._2).forall(_._2.length == 3))
    assert(a.groupBy(_._4).forall(_._2.length == 3))
    // stratum b (5 docs): offsets 1, 7→2, 31→1 mod 5; all nonzero so
    // 3 negatives per doc, offsets 1 and 31 landing on the same doc
    val b = out.filter(_._1 == "b")
    assert(b.groupBy(_._2).forall(_._2.length == 3))
  }

  test("linearClassifier: all-OOV docs score 0, vocab df-gates") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "alpha beta"),
      (3L, "uniqueword onlyhere")).toDF("doc_id", "text")
    val out = TextAnalysis.linearClassifier(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 3's tokens appear in one doc only (df=1 < 2): zero hits
    assert(out(3L) == ((2L, 0L, 0L)))
    // docs 1/2 hit on alpha+beta (df=2); doc 1 counts alpha twice
    assert(out(1L)._1 == 3L && out(1L)._2 == 3L)
    assert(out(2L)._1 == 2L && out(2L)._2 == 2L)
  }

  test("corrMatrix: exact ±1 on linear columns, symmetry of n") {
    val df = (1 to 100).map(i => (i.toDouble, 2.0 * i + 3.0, -1.0 * i))
      .toDF("x", "y", "z")
    val out = Profile.corrMatrix(df, Seq(
      "x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.size == 3)
    assert(out(("x", "y")) == ((100L, 1.0)))
    assert(out(("x", "z")) == ((100L, -1.0)))
    assert(out(("y", "z")) == ((100L, -1.0)))
  }

  test("triangleCounts: K4 has 4 triangles, every node in 3; star has none") {
    // K4 on 1..4 (either orientation in the input), plus a star on
    // 10..13 (no triangles) and a dangling edge
    val k4 = for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (b.toLong, a.toLong)
    val star = Seq((10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L))
    val edges = (k4 ++ star).toDF("a", "b")
    val out = Graph.triangleCounts(edges, col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // C(4,3) = 4 triangles; each K4 node participates in 3
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("pcaPower: recovers a planted dominant direction") {
    // variance concentrated on dim 1: x_1 = ±1 alternating, other
    // dims near-constant noise — the top PC must align with dim 1
    val vecs = (0 until 40).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array(0.001f * (i % 3), s, 0.002f * (i % 2)))
    }.toDF("vec_id", "embedding")
    val w = Embed.pcaPower(vecs, col("embedding"), col("vec_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.size == 3)
    // dominant component is dim 1 at full magnitude ~1e6; the noise
    // dims are orders of magnitude smaller
    assert(math.abs(w(1L)) > 900000L)
    assert(math.abs(w(0L)) < 100000L && math.abs(w(2L)) < 100000L)
  }

  test("groupTrend: exact line recovered; single-x group yields nulls") {
    val pts = (0L to 10L).map(x => ("line", x, 2L * x + 3L)) ++
      Seq(("flat", 5L, 100L), ("flat", 5L, 200L))
    val out = Profile.groupTrend(pts.toDF("g", "x", "y"),
      col("g"), col("x"), col("y")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out("line") == ((11L, Some(2.0), Some(3.0))))
    assert(out("flat") == ((2L, None, None)))
  }

  test("histogram: exact equi-width buckets, extremes land in 0 and last") {
    // values 0..99 in cents, 10 buckets of exactly 10
    val out = Profile.histogram((0L to 99L).toDF("v"), col("v"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.length == 10)
    assert(out.head == ((0L, 10L, 0L, 9L)))
    assert(out.last == ((9L, 10L, 90L, 99L)))
  }

  test("naiveBayesConfusion: separable classes land on the diagonal") {
    // two classes with disjoint vocab, one doc of B-vocab mislabeled
    // A — NB must still classify it as B (text beats the prior)
    val docs = ((1 to 10).map(i => (i.toLong, "aa aa aa", "A")) ++
      (11 to 20).map(i => (i.toLong, "bb bb bb", "B")) ++
      Seq((21L, "bb bb bb", "A"))).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.naiveBayesConfusion(docs,
      col("text"), col("doc_id"), col("lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(("A", "A") -> 10L, ("A", "B") -> 1L,
      ("B", "B") -> 10L))
  }

  test("rollingFingerprintPortable: duplicates share, short text = whole-text hash") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "short"), (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.rollingFingerprintPortable(
      docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    // texts shorter than the window hash their full length: one
    // window = md5 of the whole string, top 60 bits
    val exp = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("short")
        .substring(0, 15), 16)
    assert(out(3L) == exp)
    // null behaves as empty text (md5(''))
    val expEmpty = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("")
        .substring(0, 15), 16)
    assert(out(4L) == expEmpty)
  }
}
