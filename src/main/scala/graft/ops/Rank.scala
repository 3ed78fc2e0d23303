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

  /** append `rankCol` = exact 1-based global rank under `sort`.
    *
    * The ranged layout is LAZILY localCheckpoint'd (r12): the offsets
    * branch re-plans `local` otherwise, and because it prunes to
    * (__pid) its range exchange canonicalizes DIFFERENTLY from the
    * main branch's — no ReusedExchange, so the caller's whole
    * upstream executed twice (measured on customer_rfm: the melt's
    * aggregation subtree duplicated wholesale). Materializing the
    * layout once is the two-phase trick done right: phase 2 reads
    * phase 1's blocks, never its plan. Lazy (eager=false), so the
    * first action — usually the offsets broadcast — pays the one
    * materialization; localCheckpoint not persist per the
    * cache-hygiene contract (blocks GC'd by the ContextCleaner).
    */
  def globalRank(df: DataFrame, sort: Seq[Column], rankCol: String): DataFrame = {
    require(sort.nonEmpty, "globalRank needs at least one sort column")
    val local = df
      .repartitionByRange(sort: _*)
      .sortWithinPartitions(sort: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__ln",
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)) + 1L)
      .localCheckpoint(false)
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum("__n").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // GUARD: `__ln` is the low-33-bit record index of
      // monotonically_increasing_id — a range partition past 2^33 rows
      // would WRAP it silently. Unreachable at sane partition counts
      // (2^33 rows ≈ hundreds of GB in one partition), but the check is
      // free here: it runs on the partition-count-sized offsets rows,
      // and `__off` is always consumed so it cannot be pruned away.
      .select(col("__pid"),
        when(col("__n") > lit((1L << 33) - 1),
          raise_error(concat(lit("globalRank: a range partition holds "),
            col("__n"),
            lit(" rows (> 2^33-1, the per-partition id bound) — " +
              "repartition finer"))).cast("long"))
          .otherwise(col("__off")).as("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, col("__ln") + col("__off"))
      .drop("__pid", "__ln", "__off")
  }

  /** append `cumCol` = exact inclusive GLOBAL running sum of
    * `value` (a long) under `sort` — the same two-phase shape as
    * [[globalRank]]: range-partition, LOCAL running sum within each
    * sorted partition, then add the broadcast exclusive per-partition
    * TOTALS. A naive `sum().over(Window.orderBy(...))` plans a
    * SinglePartition sort of the whole table — the one-reducer
    * bottleneck this helper exists to avoid (at 100 TB a Pareto /
    * cumulative-share query is exactly where that bites).
    */
  def globalCumSum(df: DataFrame, sort: Seq[Column], value: Column,
                   cumCol: String): DataFrame = {
    require(sort.nonEmpty, "globalCumSum needs at least one sort column")
    val local = df
      .withColumn("__v", value.cast("long"))
      .repartitionByRange(sort: _*)
      .sortWithinPartitions(sort: _*)
      .withColumn("__pid", spark_partition_id())
    // local inclusive running sum: a window keyed on the partition id.
    // This plans ONE more exchange (hash on __pid — rows move as whole
    // partitions, every reducer gets exactly one) — two data shuffles
    // total, but crucially NO SinglePartition stage ever touches the
    // data; the naive global orderBy window funnels the entire table
    // through one reducer.
    val w = Window.partitionBy("__pid").orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // lazily materialized so the offsets branch reads phase 1's
    // blocks instead of re-planning (and re-executing) its subtree —
    // see globalRank's scaladoc
    val withLocal = local.withColumn("__lcum", sum("__v").over(w))
      .localCheckpoint(false)
    val offsets = withLocal.groupBy("__pid").agg(sum("__v").as("__t"))
      .withColumn("__off",
        coalesce(sum("__t").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    withLocal.join(broadcast(offsets), "__pid")
      .withColumn(cumCol, col("__lcum") + col("__off"))
      .drop("__pid", "__lcum", "__off", "__v")
  }

  /** [[globalRank]] and [[globalCumSum]] FUSED over one range layout:
    * a consumer that needs both (the Pareto shape: rank by value AND
    * the running total in the same order) would otherwise pay the
    * range-partition sort twice. One repartitionByRange + sort, one
    * local window, ONE offsets aggregate carrying both the exclusive
    * row-count and value-total prefixes — the broadcastable
    * partition-count-sized table again.
    */
  def globalRankCumSum(df: DataFrame, sort: Seq[Column], value: Column,
                       rankCol: String, cumCol: String): DataFrame = {
    require(sort.nonEmpty, "globalRankCumSum needs at least one sort column")
    val local = df
      .withColumn("__v", value.cast("long"))
      .repartitionByRange(sort: _*)
      .sortWithinPartitions(sort: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withLocal = local
      .withColumn("__lcum", sum("__v").over(w))
      .withColumn("__ln", count(lit(1)).over(w))
      .localCheckpoint(false)
    val offsets = withLocal.groupBy("__pid")
      .agg(count(lit(1)).as("__n"), sum("__v").as("__t"))
      .withColumn("__offn",
        coalesce(sum("__n").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__offv",
        coalesce(sum("__t").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__offn", "__offv")
    withLocal.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, col("__ln") + col("__offn"))
      .withColumn(cumCol, col("__lcum") + col("__offv"))
      .drop("__pid", "__ln", "__lcum", "__offn", "__offv", "__v")
  }
}
