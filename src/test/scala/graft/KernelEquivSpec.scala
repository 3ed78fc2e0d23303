package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Dedup, KMeans, TextAnalysis}

/** r16 optimization round: the ml_kmeans / ml_naive_bayes / scrub
  * per-row kernels moved from interpreted HOF spellings
  * (CodegenFallback) to native codegen'd loop expressions
  * (functions/MlKernels). The operators' arithmetic is exact-integer,
  * so the two spellings must agree BIT FOR BIT — pinned here on live
  * data and on adversarial synthetic corpora (HALF_UP rounding
  * boundaries, null text, null embedding elements); the DuckDB mirror
  * additionally hash-gates the shipped queries.
  */
class KernelEquivSpec extends SparkSpec {

  // ---------------------------------------------------------- kmeans

  private def assertKmSame(df: DataFrame, k: Int = 8, iters: Int = 3): Unit = {
    val v2 = KMeans.assign(df, col("embedding"), col("vec_id"), k, iters,
      nativeKernel = true).collect().toSeq
    val v1 = KMeans.assign(df, col("embedding"), col("vec_id"), k, iters,
      nativeKernel = false).collect().toSeq
    assert(v2 == v1)
  }

  private def embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  test("kmeans: native kernel equals the HOF spelling on sf0.001") {
    assertKmSame(graft.core.Tables.embeddings(spark, sfDir))
  }

  test("kmeans: equality on a grid corpus full of exact .5 micro boundaries") {
    // components k/256: x*1e6 lands on .25/.5/.75 decimals — the
    // HALF_UP-vs-half-even surface of the micro conversion
    val rows = (0 until 60).map { i =>
      Row(i.toLong, (0 until 5).map(j =>
        ((i * 7 + j * 13) % 512 - 256) / 256.0f).toSeq)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), embSchema)
    assertKmSame(df, k = 4, iters = 3)
  }

  test("kmeans: equality when some vectors carry null elements") {
    // a null element nulls every candidate dist2 → nulls-first struct
    // ordering assigns the row to the FIRST centroid on both spellings
    val rows = (0 until 24).map { i =>
      Row(i.toLong, (0 until 4).map(j =>
        if (i % 7 == 3 && j == 2) null
        else java.lang.Float.valueOf((i * 0.31f + j) % 2.0f)).toSeq)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), embSchema)
    assertKmSame(df, k = 3, iters = 2)
  }

  // ----------------------------------------------------- naive bayes

  private def assertNbSame(df: DataFrame): Unit = {
    val v2 = TextAnalysis.naiveBayesConfusion(df, col("text"),
      col("doc_id"), col("lang"), nativeKernel = true).collect().toSeq
    val v1 = TextAnalysis.naiveBayesConfusion(df, col("text"),
      col("doc_id"), col("lang"), nativeKernel = false).collect().toSeq
    assert(v2 == v1)
  }

  test("naive bayes: native kernel equals the HOF spelling on sf0.001") {
    assertNbSame(graft.core.Tables.documents(spark, sfDir))
  }

  test("naive bayes: equality with null/empty texts (all-scores-null tie)") {
    val rows = Seq(
      Row(1L, "the cat sat on the mat", "en"),
      Row(2L, "le chat est noir", "fr"),
      Row(3L, null, "en"),          // null text → null n_tokens
      Row(4L, "", "fr"),            // empty text → [""] token
      Row(5L, "the chat sat", "en"),
      Row(6L, "zzz unseen tokens only", "fr"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    assertNbSame(df)
  }

  // ----------------------------------------------------------- scrub

  private def assertScrubSame(df: DataFrame): Unit = {
    val v2 = Dedup.exactSubstrScrub(df, col("text"), col("doc_id"),
      nativeKernel = true).collect().toSeq
    val v1 = Dedup.exactSubstrScrub(df, col("text"), col("doc_id"),
      nativeKernel = false).collect().toSeq
    assert(v2 == v1)
  }

  test("scrub: native two-pointer filter equals the HOF spelling on sf0.001") {
    assertScrubSame(Dedup.plantSpanDups(
      graft.core.Tables.documents(spark, sfDir)))
  }

  test("scrub: equality on constructed duplicates incl. fully-covered docs") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val rows = Seq(
      Row(1L, base),                          // keeper
      Row(2L, base),                          // exact copy — fully scrubbed
      Row(3L, s"prefix only here ${(1 to 12).map(i => s"tok$i").mkString(" ")} suffix words end"),
      Row(4L, "no duplication in this document at all beyond the minimum window size words"),
      Row(5L, base + " " + base))             // doubled — within-doc repeat
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    assertScrubSame(df)
  }
}
