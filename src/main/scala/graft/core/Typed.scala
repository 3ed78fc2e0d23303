package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

/** Typed access — the analog of the reference's TypedDf
  * (/root/reference/src/main/scala/com/futurice/iodf/TypedDf.scala):
  * a dataframe whose rows materialize as case-class instances.
  *
  * On Spark this is `Dataset[T]` with a case-class `Encoder`: columns
  * stay columnar (Tungsten rows) until a row is actually
  * reconstructed, which is exactly the reference's lazy `apply(i)`
  * semantics. `cast[E]` (TypedDf.scala:15) is `.as[E]` — a schema
  * re-projection, no data movement.
  */
object Typed {

  /** open a typed frame over parquet (openTypedDf analog) */
  def open[T: Encoder](spark: SparkSession, path: String): Dataset[T] =
    spark.read.parquet(path).as[T]

  /** typed view over any DataFrame (cast analog); selects the
    * encoder's columns so extra columns are pruned, not an error.
    */
  def view[T](df: DataFrame)(implicit enc: Encoder[T]): Dataset[T] = {
    val cols = enc.schema.fieldNames.map(df.col)
    df.select(cols.toIndexedSeq: _*).as[T]
  }

  /** deterministic row-range slice in the order of `keys` — the
    * Df.view(from, until) analog (Df.scala:96). Global order needs a
    * sort; at scale prefer key-range predicates (pushdown) over
    * offset slicing.
    */
  def slice[T](ds: Dataset[T], from: Long, until: Long, keys: Seq[String]): Dataset[T] = {
    // offset/limit are Int-typed in Spark: reject ranges the engine
    // cannot express instead of silently wrapping negative via toInt
    require(from >= 0 && until >= from && until <= Int.MaxValue,
      s"slice [$from, $until) must satisfy 0 <= from <= until <= ${Int.MaxValue}")
    ds.orderBy(keys.map(ds.col).toIndexedSeq: _*)
      .offset(from.toInt).limit((until - from).toInt)
  }
}
