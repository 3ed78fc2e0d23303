package graft

import graft.functions.TokenOps
import org.apache.spark.sql.functions._

/** The native token kernels must be value-identical to the
  * declarative HigherOrderFunction spellings they replaced — checked
  * on the real corpus, plus edge cases the corpus lacks.
  */
class TokenOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.read.parquet(s"$sfDir/documents.parquet")

  test("word_shingles(distinct) equals transform+array_join+array_distinct on the corpus") {
    val toks = split(lower(col("text")), " ")
    val declarative = array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - 3, lit(0))),
      i => array_join(slice(toks, i + 1, lit(3)), " ")))
    val diff = corpus.select(
        TokenOps.wordShingles(toks, 3, distinct = true).as("n"),
        declarative.as("d"))
      .where(col("n") =!= col("d")).count()
    assert(diff === 0)
  }

  test("word_shingles edge cases: short docs, empty strings, duplicates") {
    val rows = Seq("a b c d", "a", "", "x x x x", "a b a b a b")
      .toDF("text")
    val toks = split(col("text"), " ")
    val declarative = array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - 2, lit(0))),
      i => array_join(slice(toks, i + 1, lit(2)), " ")))
    val got = rows.select(
      TokenOps.wordShingles(toks, 2, distinct = true).as("n"),
      declarative.as("d")).collect()
    got.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1), r))
  }

  test("count_in_set equals size(filter(isInCollection)) on the corpus") {
    val words = graft.ops.TextAnalysis.stopwords("en")
    val toks = split(lower(col("text")), " ")
    val diff = corpus.select(
        TokenOps.countInSet(toks, words).as("n"),
        size(filter(toks, t => t.isInCollection(words))).as("d"))
      .where(col("n") =!= col("d")).count()
    assert(diff === 0)
  }
}
