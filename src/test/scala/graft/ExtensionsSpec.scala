package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions: vec_dot and rolling_min_hash") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(dot === 11.0)
    val h1 = spark.sql("SELECT rolling_min_hash('identical text body here')")
      .head().getLong(0)
    val h2 = spark.sql("SELECT rolling_min_hash('identical text body here')")
      .head().getLong(0)
    assert(h1 === h2)
    // simhash64 from SQL equals the DataFrame-side operator's value
    val sqlFp = spark.sql(
      "SELECT simhash64(array('red', 'big')) AS fp").head().getLong(0)
    import spark.implicits._
    val dfFp = graft.ops.Dedup.simhash(
        Seq((1L, "red big")).toDF("doc_id", "text"),
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.col("doc_id"))
      .head().getLong(1)
    assert(sqlFp === dfFp)
    // windowed variant with explicit window arg
    val h3 = spark.sql("SELECT rolling_min_hash('identical text body here', 8)")
      .head().getLong(0)
    assert(h3 !== 0L)
  }

  test("registered SQL kernels: word_shingles, minhash_sig, sig_match_count") {
    GraftExtensions.register(spark)
    // word_shingles(tokens, w, distinct) mirrors the DataFrame kernel
    val sh = spark.sql(
      "SELECT word_shingles(array('a','b','c','a','b','c'), 3, 1) AS s")
      .head().getSeq[String](0)
    assert(sh === Seq("a b c", "b c a", "c a b"))
    // identical token arrays → identical signatures, full match count
    val m = spark.sql(
      """SELECT sig_match_count(
        |  minhash_sig(word_shingles(array('x','y','z','w'), 3, 1), 16),
        |  minhash_sig(word_shingles(array('x','y','z','w'), 3, 1), 16)) AS m"""
        .stripMargin).head().getInt(0)
    assert(m === 16)
    // and the SQL signature equals the DataFrame-side operator's
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dfSig = Seq(Tuple1("x y z w")).toDF("text")
      .select(graft.ops.Dedup.minhashSigCol(col("text"), k = 16).as("sig"))
      .head().getSeq[Long](0)
    val sqlSig = spark.sql(
      "SELECT minhash_sig(word_shingles(split(lower('x y z w'), ' '), 3, 1), 16)")
      .head().getSeq[Long](0)
    assert(sqlSig === dfSig)
  }

  test("unicode_normalize and z_interleave are SQL-callable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    GraftExtensions.register(spark)
    // decomposed é (e + combining acute) composes to one NFC char
    val n = spark.sql("SELECT length(unicode_normalize('Café')), " +
      "length(unicode_normalize('Café', 'NFD'))").head()
    assert(n.getInt(0) === 4 && n.getInt(1) === 5)
    // Morton interleave: (0b11, 0b00) -> 0b0101; matches the column API
    val z = spark.sql("SELECT z_interleave(3L, 0L), z_interleave(0L, 3L)")
      .head()
    assert(z.getLong(0) === 5L && z.getLong(1) === 10L)
    val viaCol = Seq((3L, 0L)).toDF("a", "b")
      .select(graft.functions.ZInterleave(col("a"), col("b"))).head().getLong(0)
    assert(viaCol === 5L)
    // a typo'd form fails at plan time, not on the executor
    val e = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'NFX')").collect()
    }
    assert(e.getMessage.contains("NFX") || e.getMessage.contains("normalization"))
  }
}

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("near-dup pairs collapse into min-labeled clusters") {
    // chain 1-2, 2-3 plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val c = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("clusters of the corpus minhash pairs match exact-jaccard pairs") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    import org.apache.spark.sql.functions._
    val pairs = Dedup.minhashLsh(corpus, col("text"), col("doc_id"))
    val c = Dedup.clusters(pairs)
    // every clustered doc's label is ≤ its own id, and labels are members
    val rows = c.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.forall { case (id, l) => l <= id })
    val ids = rows.map(_._1).toSet
    assert(rows.map(_._2).forall(ids.contains))
  }
}
