package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persistence for indexed frames — Spark-native analog of the
  * reference's write/open/have lifecycle
  * (/root/reference/src/main/scala/com/futurice/iodf/Dfs.scala:489-554:
  * writeIndexedDf / openIndexedDf / haveIndexedDf over a memory-mapped
  * dir).
  *
  * Layout: `<dir>/data` (the rows, parquet) and `<dir>/index` (the
  * (field,value,f) index frame, parquet, sorted by field,value so
  * min/max stats give per-file pruning on index lookups). Parquet is
  * the mmap analog — reopening is O(footers), columns decode on
  * demand, and both parts scale out instead of living in one file.
  */
object Store {

  /** write rows + index (reference writeIndexedDf) */
  def write(df: DataFrame, dir: String, spec: IndexSpec): Unit = {
    df.write.mode(SaveMode.Overwrite).parquet(s"$dir/data")
    IndexedFrame(df, spec).entries
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/index")
  }

  /** reopen a written frame + its persisted index (openIndexedDf) */
  def open(spark: SparkSession, dir: String, spec: IndexSpec): StoredFrame =
    StoredFrame(
      IndexedFrame(spark.read.parquet(s"$dir/data"), spec),
      spark.read.parquet(s"$dir/index"))

  /** write-if-absent then open (haveIndexedDf) */
  def have(spark: SparkSession, dir: String, spec: IndexSpec)
          (provide: => DataFrame): StoredFrame = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/data")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) write(provide, dir, spec)
    open(spark, dir, spec)
  }

  /** incremental segment append — the reference's merge story
    * (writeMergedIndexedDf, Dfs.scala:476-487) as streaming ingest:
    * new rows append as a parquet segment and the persisted index is
    * merged incrementally (old index ∪ batch index → groupBy sum),
    * NEVER by rescanning old data. Usable directly as a
    * foreachBatch sink: `.foreachBatch((b, _) => Store.append(b, dir, spec))`.
    */
  def append(batch: DataFrame, dir: String, spec: IndexSpec): Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val indexPath = new org.apache.hadoop.fs.Path(s"$dir/index")
    val fs = indexPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchIndex = IndexedFrame(batch, spec).entries
    val merged =
      if (fs.exists(indexPath)) {
        // read BEFORE overwrite: materialize the old index first
        val old = spark.read.parquet(s"$dir/index").localCheckpoint(true)
        old.unionByName(batchIndex)
          .groupBy("field", "value").agg(sum("f").as("f"))
          .orderBy("field", "value")
      } else batchIndex
    val mergedStable = merged.localCheckpoint(true)
    batch.write.mode(SaveMode.Append).parquet(s"$dir/data")
    mergedStable.write.mode(SaveMode.Overwrite).parquet(s"$dir/index")
  }

  /** bucketed write for co-located joins: tables bucketed+sorted on
    * the same key join with NO shuffle on either side (the 100 TB
    * answer to "this join is run every day on the same key" — the
    * reference's single-node analog is its presorted merge,
    * Dfs.scala:222-228). Bucketing requires the table catalog, hence
    * saveAsTable rather than a path write.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}

/** a reopened frame: live IndexedFrame + the persisted index table
  * (pre-aggregated — index_freqs-style lookups hit the small sorted
  * parquet instead of rescanning the data).
  */
final case class StoredFrame(frame: IndexedFrame, persistedIndex: DataFrame) {
  /** frequency of (field,value) from the persisted index — a pruned
    * point read, the analog of opening one bitmap's popcount.
    */
  def f(field: String, value: String): DataFrame = {
    import org.apache.spark.sql.functions._
    persistedIndex
      .where(col("field") === field && col("value") === value)
      .select(col("f"))
  }
}
