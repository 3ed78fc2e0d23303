package graft

import org.apache.spark.sql.functions._

/** Quantitative accuracy guarantees for the sketch-family rows-only
  * queries (the same pattern as the ±5% HLL assertion in
  * IndexedFrameSpec): an approximate answer with no error bound is
  * not an answer.
  */
class SketchSpec extends SparkSpec {

  test("approx percentiles within 1% relative of exact percentiles") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val approx = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)")
        .as("pcts"))
      .select(col("l_returnflag"), col("pcts")(0).as("p50"), col("pcts")(1).as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (flag, (e50, e90)) =>
      val (a50, a90) = approx(flag)
      assert(math.abs(a50 - e50) / e50 <= 0.01, s"$flag p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 <= 0.01, s"$flag p90: $a90 vs $e90")
    }
  }
}
