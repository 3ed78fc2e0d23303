package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.core.{IndexSpec, IndexedFrame}

/** Spark-native analog of the reference's MultiDf / merged writes
  * (/root/reference/src/main/scala/com/futurice/iodf/MultiDf.scala and
  * Dfs.scala:222-228, 476-487).
  *
  * The reference physically merge-sorts per-segment column files and
  * index bitmaps. On Spark, concatenation is a logical `unionByName`
  * (zero data movement — segments stay where they are; the scan reads
  * both); a merged *index* is the index frame built over the union,
  * which Catalyst evaluates as one scan per segment + one map-side
  * combined shuffle — the same cost profile as the reference's
  * merge-sort, but distributed.
  */
object Merge {

  /** logical concatenation of N segments (MultiDf.autoClosing analog).
    * Segments may have DIFFERENT column sets — the reference
    * merge-sorts the UNION of per-segment colIds and reads absent
    * columns as empty (MultiDf.scala:43-57,109); the Spark analog is
    * `allowMissingColumns`, which null-fills a column in segments
    * that lack it.
    */
  def multiFrame(segments: Seq[DataFrame]): DataFrame =
    segments.reduce(_.unionByName(_, allowMissingColumns = true))

  /** zero-or-more-segment concatenation (reference
    * DfTest."merging-zero-indexed-dfs" / "empty-indexed-multidf":
    * merging no segments yields a valid EMPTY frame, not an error).
    * With no segment to infer from, the schema is supplied.
    */
  def multiFrame(spark: SparkSession, schema: StructType,
                 segments: Seq[DataFrame]): DataFrame =
    if (segments.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else multiFrame(segments)

  /** schema of every index frame: (field, value, f) */
  val indexSchema: StructType = StructType(Seq(
    StructField("field", StringType, nullable = false),
    StructField("value", StringType),
    StructField("f", LongType, nullable = false)))

  /** merged index over N segments == index of the concatenation
    * (writeMergedIndexedDf analog: merge-sorted (field,value) entries
    * with per-entry frequencies summed across segments).
    */
  def mergedIndex(segments: Seq[DataFrame], spec: IndexSpec): DataFrame =
    IndexedFrame(multiFrame(segments), spec).entries

  /** zero-segment merged index: a valid empty index frame */
  def mergedIndex(spark: SparkSession, segments: Seq[DataFrame],
                  spec: IndexSpec): DataFrame =
    if (segments.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], indexSchema)
    else mergedIndex(segments, spec)
}
