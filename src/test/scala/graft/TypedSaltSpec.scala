package graft

import graft.core.Typed
import graft.ops.Salt
import org.apache.spark.sql.functions._

case class Part(p_partkey: Long, p_brand: String, p_size: Int)

class TypedSaltSpec extends SparkSpec {
  import spark.implicits._

  test("typed view materializes case-class rows (TypedDf analog)") {
    val ds = Typed.view[Part](spark.read.parquet(s"$sfDir/part.parquet"))
    val first = ds.orderBy("p_partkey").head()
    assert(first.isInstanceOf[Part])
    assert(first.p_brand.startsWith("Brand#"))
  }

  test("typed slice matches orderBy+offset window (Df.view analog)") {
    val ds = Typed.view[Part](spark.read.parquet(s"$sfDir/part.parquet"))
    val s = Typed.slice(ds, 10, 15, Seq("p_partkey")).collect()
    val all = ds.orderBy("p_partkey").collect()
    assert(s.toSeq === all.slice(10, 15).toSeq)
  }

  test("salted aggregation equals plain groupBy aggregation") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val salted = Salt.saltedAgg(li, col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)"), col("l_orderkey"))
      .select(col("k"), col("n"), col("total").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = li.groupBy(col("l_returnflag").as("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === plain)
  }
}
