package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT GLOBAL RANK without a single-partition data sort — the
  * reusable form of the two-phase trick proven in
  * [[Curation.shufflePositions]] (and the index_nav flattening):
  * range-partition by the sort key (contiguous ascending ranges) →
  * per-partition row index read off the sorted stream
  * (`monotonically_increasing_id` after `sortWithinPartitions` — a
  * `Window.partitionBy(pid)` would plan a SECOND full-data exchange)
  * → exclusive per-partition offsets (a partition-count-sized
  * aggregate, broadcast back). The only SinglePartition stage
  * touches the ~numShufflePartitions offset rows, never the data.
  *
  * The caller must pass a TOTAL order (append a unique tiebreak
  * column) or equal keys get arbitrary-but-distinct ranks.
  */
object Rank {

  /** append `rankCol` = exact 1-based global rank under `sort`. */
  def globalRank(df: DataFrame, sort: Seq[Column], rankCol: String): DataFrame = {
    require(sort.nonEmpty, "globalRank needs at least one sort column")
    val local = df
      .repartitionByRange(sort: _*)
      .sortWithinPartitions(sort: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__ln",
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)) + 1L)
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum("__n").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, col("__ln") + col("__off"))
      .drop("__pid", "__ln", "__off")
  }
}
