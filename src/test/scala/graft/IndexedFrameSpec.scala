package graft

import graft.core.{Analyzers, CoStats, IndexSpec, IndexedFrame}
import org.apache.spark.sql.functions._

class IndexedFrameSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", "x", "red big"), ("a", "y", "red small"),
    ("b", "x", "blue big"), ("a", "x", "red big")
  ).toDF("f1", "f2", "txt")

  private val spec = IndexSpec(Seq("f1", "f2", "txt"))
    .withAnalyzer("txt", Analyzers.whitespace)

  test("entries matches hand count, tokens analyzed") {
    val ix = IndexedFrame(df, spec)
    val e = ix.entries.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(e(("f1", "a")) === 3L)
    assert(e(("f2", "x")) === 3L)
    assert(e(("txt", "red")) === 3L)
    assert(e(("txt", "big")) === 3L)
    assert(e(("txt", "small")) === 1L)
  }

  test("duplicate tokens in one row count once: f is rows, not occurrences") {
    // reference bitmap semantics: "hello hello" sets ONE bit — the
    // persisted index f must agree with the live predicate row count
    val dup = Seq((1L, "hello hello world"), (2L, "hello there"))
      .toDF("id", "txt")
    val ix = IndexedFrame(dup, IndexSpec(Seq("txt"))
      .withAnalyzer("txt", Analyzers.whitespace))
    val e = ix.entries.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(e(("txt", "hello")) === 2L) // two DOCS, not three occurrences
    assert(e(("txt", "hello")) === ix.fDF("txt", "hello").head().getLong(0))
  }

  test("analyzed predicate matches token membership") {
    val ix = IndexedFrame(df, spec)
    assert(ix.fDF("txt", "red").head().getLong(0) === 3L)
    assert(ix.fDF("f1", "b").head().getLong(0) === 1L)
    assert(ix.fDF("txt", "missing").head().getLong(0) === 0L)
  }

  test("withoutField drops a field from the index spec and its entries") {
    val ix = IndexedFrame(df, spec.withoutField("f2"))
    val fields = ix.entries.select("field").distinct()
      .collect().map(_.getString(0)).toSet
    assert(fields === Set("f1", "txt"))
  }

  test("colNameValuesWithIndex yields global ordinals in index sort order") {
    val ix = IndexedFrame(df, spec)
    // full index sorted (field,value): f1:[a,b] f2:[x,y] txt:[big,blue,red,small]
    val f2 = ix.colNameValuesWithIndex("f2").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(f2.toSeq === Seq(("x", 2L), ("y", 3L))) // offset past f1's 2 entries
    val txt = ix.colNameValuesWithIndex("txt").collect().map(_.getLong(2))
    assert(txt.toSeq === Seq(4L, 5L, 6L, 7L))
  }

  test("indexOf returns the global ordinal of one entry, empty when absent") {
    val ix = IndexedFrame(df, spec)
    // sorted index: f1:[a,b] f2:[x,y] ... → f2->y is ordinal 3
    assert(ix.indexOfDF("f2", "y").head().getLong(0) === 3L)
    assert(ix.indexOfDF("f2", "missing").count() === 0)
  }

  test("typedView re-projects rows as case classes without data movement") {
    val ix = IndexedFrame(df, spec)
    val typed = ix.typedView[FrameRow].collect()
    assert(typed.length === 4)
    assert(typed.count(_.f1 == "a") === 3)
  }

  test("distributed coStats equals the closed-form case class") {
    val ix = IndexedFrame(df, spec)
    val cs = ix.coStats(ix.predicate("f1", "a"), ix.predicate("txt", "big"))
    val expected = CoStats(n = 4, fA = 3, fB = 3, fAB = 2)
    assert(cs === expected)
    assert(math.abs(cs.mi - expected.mi) < 1e-12)
  }

  test("char-ngram and stemmer analyzers produce expected tokens") {
    val d = Seq((1L, "spark running dogs")).toDF("id", "txt")
    val ng = d.select(Analyzers.charNgrams(3)(col("txt"))).head().getSeq[String](0)
    assert(ng.contains("spa") && ng.contains("par") && ng.contains("ark"))
    assert(ng.contains("run") && ng.contains("ing"))
    val st = d.select(Analyzers.stemmed(col("txt"))).head().getSeq[String](0)
    assert(st === Seq("spark", "runn", "dog"))
  }

  test("hot-shingle cap prevents quadratic pairs from stop phrases") {
    // 6 docs all share one phrase; only 0 and 1 are real near-dups
    val shared = "common boilerplate header phrase appears everywhere"
    val docs = Seq(
      (0L, s"$shared unique alpha beta gamma delta epsilon zeta eta"),
      (1L, s"$shared unique alpha beta gamma delta epsilon zeta theta"),
      (2L, s"$shared totally different content one two three four five"),
      (3L, s"$shared other words entirely six seven eight nine ten"),
      (4L, s"$shared more unrelated body eleven twelve thirteen fourteen"),
      (5L, s"$shared final variant fifteen sixteen seventeen eighteen nineteen")
    ).toDF("doc_id", "text")
    // cap=3: the shared-phrase shingles (freq 6) are dropped; the
    // unique-content shingles keep 0-1 paired
    val pairs = graft.ops.Dedup.ngramJaccard(docs, col("text"), col("doc_id"),
        minJaccard = 0.2, maxShingleFreq = 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("approx cardinalities within ±5% of exact distinct counts") {
    // quantitative accuracy guarantee for the rows-only index_approx
    // query (the HLL family used — DataSketches lgK=12 — carries
    // ~1.6% RSE, so ±5% holds with wide margin on every indexed
    // field of the index_approx query's own spec)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val fields = Seq("l_returnflag", "l_partkey", "l_suppkey")
    val ix = IndexedFrame(li, graft.core.IndexSpec(fields))
    val approx = ix.approxCardinalities().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fields.foreach { f =>
      val e = li.select(f).distinct().count()
      val a = approx(f)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$f: approx $a vs exact $e")
    }
  }

  test("coStatsMatrix rows carry the same counts as point coStats") {
    val ix = IndexedFrame(df, spec)
    val m = ix.coStatsMatrix("f1", "f2").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // (a, x): n=4, fa=3 (f1=a), fb=3 (f2=x), fab=2
    assert(m(("a", "x")) === ((4L, 3L, 3L, 2L)))
    val point = ix.coStats(ix.predicate("f1", "a"), ix.predicate("f2", "x"))
    assert(point.fAB === 2L)
  }
}

/** typedView target (top-level for a stable Encoder) */
case class FrameRow(f1: String, f2: String, txt: String)
