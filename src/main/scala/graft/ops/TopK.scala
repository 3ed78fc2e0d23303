package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, SortOrder}
import org.apache.spark.sql.types.LongType
import graft.plans.{TopKPerGroup, TopKStrategy}

/** Public face of the custom per-group top-k operator
  * ([[graft.plans.TopKPerGroup]]): bounded k-heaps instead of a full
  * per-group sort, with map-side partial pruning before the shuffle.
  */
object TopK {

  /** k best rows per group under `orderBy` (best first), with a
    * 1-based `rankCol` appended. Plan shape: partial bounded heap per
    * input partition → shuffle of ≤ k rows per (group, partition) →
    * final heap merge. Equivalent to (and spec-checked against)
    * `row_number().over(Window.partitionBy(groupBy).orderBy(orderBy))
    * <= k`, without ever sorting a whole group.
    */
  def perGroup(df: DataFrame, groupBy: Seq[Column], orderBy: Seq[Column],
               k: Int, rankCol: String = "rnk"): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val child = df.queryExecution.analyzed
    def resolved(c: Column) = GraftShims.resolvedExpression(spark, child, c)
    val groupExprs = groupBy.map(resolved)
    val sortOrder = orderBy.map(c => resolved(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val rankAttr = AttributeReference(rankCol, LongType, nullable = false)()
    GraftShims.ofRows(spark,
      TopKPerGroup(groupExprs, sortOrder, k, rankAttr, child))
  }

  /** idempotently register the planner strategy on a live session */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
}
