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

  test("numeric fields order by native value, not string form") {
    // the reference's typed index ordering (Dfs.indexColIdOrdering,
    // Dfs.scala:310-328): an Int column's entries never read "10" < "2"
    val num = Seq((2, "b"), (10, "a"), (1, "a"), (10, "b"))
      .toDF("n", "s")
    val ix = IndexedFrame(num, IndexSpec(Seq("n", "s")))
    assert(ix.colValues("n").collect().map(_.getString(0)).toSeq ===
      Seq("1", "2", "10"))
    // string fields keep lexicographic order
    assert(ix.colValues("s").collect().map(_.getString(0)).toSeq ===
      Seq("a", "b"))
    // entries: within field n, typed order; field sort itself unchanged
    assert(ix.entries.where($"field" === "n").collect()
      .map(_.getString(1)).toSeq === Seq("1", "2", "10"))
    // global ordinals count in typed order and keep the cross-field
    // offset ("n" precedes "s": 3 n-entries, then the s-entries)
    val ords = ix.colNameValuesWithIndex("s").collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(ords === Map("a" -> 3L, "b" -> 4L))
    val nOrds = ix.colNameValuesWithIndex("n").collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(nOrds === Map("1" -> 0L, "2" -> 1L, "10" -> 2L))
  }

  test("analyzed numeric-typed field keeps string token order") {
    // an analyzer emits string TOKENS — typed ordering applies only to
    // identity-indexed numeric columns, never to analyzed ones
    val num = Seq((2, "x"), (10, "x")).toDF("n", "s")
    val ix = IndexedFrame(num,
      IndexSpec(Seq("n")).withAnalyzer("n", Analyzers.whitespace))
    assert(ix.colValues("n").collect().map(_.getString(0)).toSeq ===
      Seq("10", "2")) // lexicographic: analyzed field
  }

  test("live rowRefs carries one ref per matching row per entry") {
    // bitmap semantics: refs-per-entry count == the entry's f, and
    // rowsOf(field,value) equals the refs slice for that entry
    val d = Seq((1L, "a", "red big"), (2L, "b", "red small"),
      (3L, "a", "red red")).toDF("id", "cat", "txt")
    val sp = IndexSpec(Seq("cat", "txt"))
      .withAnalyzer("txt", Analyzers.whitespace).withRowRefs("id")
    val ix = IndexedFrame(d, sp)
    val refs = ix.rowRefs.collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    // "red red" sets ONE bit for row 3 (array_distinct discipline)
    assert(refs(("txt", "red")) === Set(1L, 2L, 3L))
    assert(refs(("cat", "a")) === Set(1L, 3L))
    // f == refs count for every entry
    val f = ix.entries.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    f.foreach { case (k, n) => assert(refs(k).size.toLong === n, k) }
    // rowsOf agrees with the refs slice
    assert(ix.rowsOf("txt", "red").collect().map(_.getLong(0)).toSet ===
      refs(("txt", "red")))
    // unset spec refuses
    intercept[IllegalArgumentException] {
      IndexedFrame(d, IndexSpec(Seq("cat"))).rowRefs
    }
  }
}

/** typedView target (top-level for a stable Encoder) */
case class FrameRow(f1: String, f2: String, txt: String)
