package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

class TextSignalsSpec extends SparkSpec {
  import spark.implicits._

  test("bigram novelty: hand-checked corpus frequencies and fractions") {
    val docs = Seq(
      (0L, "a b c"), // bigrams: "a b" (corpus c=2), "b c" (c=1)
      (1L, "a b d"), // bigrams: "a b" (c=2), "b d" (c=1)
      (2L, "x y"),   // bigram:  "x y" (c=1)
      (3L, "solo")   // < 2 tokens: no bigrams, no output row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramNovelty(docs, col("text"), col("doc_id"),
        rareAtMost = 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet === Set(0L, 1L, 2L))
    assert(got(0L) === ((2L, 1.5, 0.5))) // avg (2+1)/2; only "b c" rare
    assert(got(1L) === ((2L, 1.5, 0.5)))
    assert(got(2L) === ((1L, 1.0, 1.0))) // its one bigram is unique
  }

  test("bigram novelty: corpus invariants (counts, ranges, duplicates)") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val sig = TextAnalysis.bigramNovelty(corpus, col("text"), col("doc_id"))
    val rows = sig.collect()
    assert(rows.nonEmpty)
    // n_bigrams = tokens - 1 for every doc with >= 2 tokens
    val expected = corpus
      .select(col("doc_id"), (size(split(lower(col("text")), " ")) - 1)
        .cast("long").as("n"))
      .where(col("n") >= 1)
      .as[(Long, Long)].collect().toMap
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap === expected)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 1.0) // every bigram occurs at least once
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // a planted exact duplicate shares every bigram with its source,
    // so neither doc's bigrams can be rare at rareAtMost=1 (each
    // occurs >= 2 times corpus-wide) and both carry identical signals
    val src = corpus.orderBy("doc_id").limit(1)
      .select("doc_id", "text").as[(Long, String)].head()
    val planted = corpus.select("doc_id", "text")
      .unionByName(Seq((9999999L, src._2)).toDF("doc_id", "text"))
    val strict = TextAnalysis.bigramNovelty(planted, col("text"), col("doc_id"),
        rareAtMost = 1L)
      .where(col("doc_id").isin(src._1, 9999999L))
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(strict.length === 2)
    assert(strict(0) === strict(1))
    assert(strict.head._3 === 0.0)
  }

  test("bpePairCounts: hand-checked adjacent pair table") {
    val docs = Seq((0L, "aba ab"), (1L, "Ab!ba")).toDF("doc_id", "text")
    // normalized words: aba, ab, ab, ba
    // pairs: aba -> ab, ba ; ab -> ab ; ab -> ab ; ba -> ba
    val got = TextAnalysis.bpePairCounts(docs, col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("ab", 3L), ("ba", 2L))) // count desc, pair asc
    val capped = TextAnalysis.bpePairCounts(docs, col("text"), topN = 1)
      .collect().map(_.getString(0)).toSeq
    assert(capped === Seq("ab"))
  }

  test("tokenizeIds: dense freq-ordered vocab, ordered ids, OOV -1") {
    val docs = Seq(
      (0L, "b a b c"),
      (1L, "a b rare")
    ).toDF("doc_id", "text")
    // freq: b=3, a=2, c=1, rare=1 -> vocabSize 3 keeps b(0), a(1), c(2)
    val got = TextAnalysis.tokenizeIds(docs, col("text"), col("doc_id"),
        vocabSize = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(0L) === (("0,1,0,2", 4L, 0L)))
    assert(got(1L) === (("1,0,-1", 3L, 1L)))
  }

  test("token entropy: uniform = ln(k), repetition collapses it") {
    val docs = Seq(
      (0L, "a b c d"),        // uniform over 4 -> ln(4)
      (1L, "a a a a"),        // one token -> 0
      (2L, "a a a b")         // skewed -> strictly between
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // micro-ln protocol: H(uniform 4) = (4·lnμ4 − 4·lnμ1)/(4·10⁶)
    val lnu4 = math.round(math.log(4.0) * 1e6)
    assert(got(0L) === r6(4.0 * lnu4 / (4.0 * 1e6)))
    assert(got(1L) === 0.0)
    assert(got(2L) > 0.0 && got(2L) < got(0L))
  }

  test("topNgrams: hand-checked counts, doc support, deterministic ties") {
    val docs = Seq(
      (0L, "a b c a b c"),   // "a b c"×2, "b c a", "c a b"
      (1L, "a b c d"),       // "a b c", "b c d"
      (2L, "x y")            // < 3 tokens: contributes nothing
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topNgrams(docs, col("text"), col("doc_id"), 3, 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got === Seq(
      (1L, "a b c", 3L, 2L),
      (2L, "b c a", 1L, 1L),
      (3L, "b c d", 1L, 1L),
      (4L, "c a b", 1L, 1L)))
  }

  test("gopher rules: hand-checked counters and the integer pass logic") {
    val passing = Seq.fill(6)("the quick brown fox jumps over lazy dogs to be")
      .mkString(" ") // 60 words, mean len 3.7, stopwords the/to/be
    val docs = Seq(
      (1L, "the cat sat with the dog\n- first\n- second"),
      (2L, passing)
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.gopherRules(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap

    val a = rows(1L)
    assert(a.getLong(1) === 10L)                     // n_words
    assert(a.getLong(2) === 3L)                      // n_lines
    assert(a.getDouble(3) === 3.2)                   // mean_word_len 32/10
    assert(a.getDouble(5) === 0.666667)              // bullet_frac 2/3
    assert(a.getDouble(7) === 0.8)                   // alpha_frac 8/10
    assert(a.getLong(8) === 2L)                      // the + with
    assert(!a.getBoolean(9))                         // fails word-count rule

    val b = rows(2L)
    assert(b.getLong(1) === 60L)
    assert(b.getDouble(3) === 3.7)
    assert(b.getLong(8) === 3L)                      // the, to, be
    assert(b.getBoolean(9))                          // passes all rules
  }

  test("gopher rules: planted corpus phenomena land on the right docs") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = TextAnalysis.gopherRules(
        TextAnalysis.plantGopherDocs(corpus, col("text"), col("doc_id")),
        col("text"), col("doc_id"))
      .collect()
    assert(got.length === corpus.count())
    got.foreach { r =>
      val id = r.getLong(0)
      Seq(4, 5, 6, 7).foreach(i =>
        assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0))
      if (id % 4 == 0) assert(r.getDouble(5) > 0.0, s"doc $id bullet_frac")
      if (id % 6 == 0) assert(r.getDouble(6) > 0.0, s"doc $id ellipsis_frac")
      if (id % 9 == 0) assert(r.getDouble(4) > 0.0, s"doc $id symbol_ratio")
    }
    // the gate discriminates: both outcomes occur on the real corpus
    assert(got.exists(_.getBoolean(9)) && got.exists(!_.getBoolean(9)))
  }

  test("c4 rules: hand-checked line filter, drop reasons, and page rules") {
    val docs = Seq(
      // 4 lines: kept (5 words, '.'), dropped-no-punct, dropped-short
      // ('.' but 3 words), dropped-js ('.' + 5 words + javascript)
      (1L, "one two three four five.\nsix seven eight nine ten\n" +
        "terms of use.\nplease enable javascript to view this."),
      // page rules: enough sentences but lorem ipsum present
      (2L, "one two three four five.\nsix seven eight nine ten.\n" +
        "alpha beta gamma delta epsilon.\nlorem ipsum dolor sit amet"),
      // page rules: curly brace
      (3L, "one two three four five.\nsix seven eight nine ten.\n" +
        "alpha beta gamma delta { brace }.\nmore words to fill here."),
      // passes everything: 3 kept sentences, no lorem, no brace
      (4L, "one two three four five.\nsix seven eight nine ten!\n" +
        "alpha beta gamma delta epsilon?")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.c4Rules(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap

    val a = rows(1L)
    assert(a.getLong(1) === 4L)      // n_lines
    assert(a.getLong(2) === 1L)      // kept_lines
    assert(a.getLong(3) === 1L)      // drop_no_punct
    assert(a.getLong(4) === 1L)      // drop_short
    assert(a.getLong(5) === 1L)      // drop_js
    assert(a.getLong(6) === 1L)      // n_sentences (the one kept '.')
    assert(!a.getBoolean(9))         // < 3 sentences → fail

    assert(!rows(2L).getBoolean(9) && rows(2L).getBoolean(7))  // lorem
    assert(!rows(3L).getBoolean(9) && rows(3L).getBoolean(8))  // brace
    val d = rows(4L)
    assert(d.getLong(2) === 3L && d.getLong(6) === 3L && d.getBoolean(9))
    // drop reasons are disjoint and complete
    rows.values.foreach(r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5)
        === r.getLong(1)))
  }

  test("c4 rules: planted corpus phenomena land on the right docs") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = TextAnalysis.c4Rules(
        TextAnalysis.plantC4Docs(corpus, col("text"), col("doc_id")),
        col("text"), col("doc_id"))
      .collect()
    assert(got.length === corpus.count())
    got.foreach { r =>
      val id = r.getLong(0)
      if (id % 3 == 0) assert(r.getLong(5) > 0L, s"doc $id drop_js")
      if (id % 4 == 0) assert(r.getLong(4) > 0L, s"doc $id drop_short")
      if (id % 7 == 0) assert(r.getBoolean(7), s"doc $id has_lorem")
      if (id % 11 == 0) assert(r.getBoolean(8), s"doc $id has_brace")
    }
    assert(got.exists(_.getBoolean(9)) && got.exists(!_.getBoolean(9)))
  }
}
