package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Embed

/** r15 optimization round: `Embed.pcaPower` was restructured from
  * three corpus passes (mean → mean-join → vec_id self-join Gram)
  * plus one Spark join+agg round per power step into ONE corpus
  * co-moment aggregation plus single-row array iteration. The
  * protocol is exact integer arithmetic end to end, so the two
  * shapes must agree BIT FOR BIT — this spec pins that equality on
  * live data and on adversarial synthetic corpora (the DuckDB
  * mirror additionally hash-gates the shipped query).
  */
class PcaEquivSpec extends SparkSpec {

  private def assertSame(df: org.apache.spark.sql.DataFrame): Unit = {
    val v2 = Embed.pcaPower(df, col("embedding"), col("vec_id"))
      .collect().toSeq
    val v1 = Embed.pcaPowerV1(df, col("embedding"), col("vec_id"))
      .collect().toSeq
    assert(v2 == v1)
  }

  test("single-pass co-moment shape equals the v1 spelling on sf0.001") {
    assertSame(graft.core.Tables.embeddings(spark, sfDir))
  }

  test("equality holds on a synthetic corpus with extreme magnitudes") {
    // components at the ±2.0 protocol edge, plus tiny/zero vectors:
    // exercises the floored-mean correction terms with nonzero means
    // and the renormalization's m<1e6 passthrough branch
    val rnd = new scala.util.Random(42)
    val d = 7
    val rows = (0 until 50).map { i =>
      val base = if (i % 5 == 0) 0.0 else (i % 3) * 0.63 - 0.5
      Row(i.toLong, (0 until d).map(j =>
        (base + rnd.nextDouble() * 4.0 - 2.0).toFloat).toArray.toSeq)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    assertSame(df)
  }

  test("equality holds when every vector is identical (zero Gram)") {
    val rows = (0 until 8).map(i => Row(i.toLong, Seq(0.25f, -1.5f, 0.75f)))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    assertSame(df)
  }

  test("empty corpus yields an empty result on both shapes") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    assertSame(df)
  }

  test("iteration counts 1 and 5 agree across shapes") {
    val df = graft.core.Tables.embeddings(spark, sfDir)
    for (k <- Seq(1, 5)) {
      val v2 = Embed.pcaPower(df, col("embedding"), col("vec_id"), k)
        .collect().toSeq
      val v1 = Embed.pcaPowerV1(df, col("embedding"), col("vec_id"), k)
        .collect().toSeq
      assert(v2 == v1, s"iterations=$k")
    }
  }
}
