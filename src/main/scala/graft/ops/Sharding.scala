package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budgeted shard packing — the curation step that turns a
  * filtered corpus into training shards of ~`budget` tokens each.
  *
  * Deterministic rule: within each `part` (e.g. source or language),
  * docs are laid out in `id` order and a doc starts the shard that its
  * CUMULATIVE-TOKENS-BEFORE-IT falls in: shard = ⌊(cum − ntok) /
  * budget⌋. One running-sum window per partition + one groupBy.
  *
  * Scale posture: the window partitions by `part`, never globally — a
  * global cumulative sum would serialize into one partition at 100 TB.
  * Real pipelines shard within (source, date, …) partitions exactly
  * so the running sum parallelizes; skewed parts are themselves
  * splittable by salting the part key upstream.
  */
object Sharding {

  /** per-doc shard assignment — (part, doc_id, ntok, shard); the
    * grouped [[tokenBudgeted]] stats and the streaming face
    * ([[graft.streaming.EventPipeline.shardStream]]) both derive from
    * this rule, so the faces cannot drift
    */
  def assignShards(df: DataFrame, text: Column, id: Column, part: Column,
                   budget: Long): DataFrame = {
    val w = Window.partitionBy("part").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(part.as("part"), id.as("doc_id"),
        size(split(text, " ")).cast("long").as("ntok"))
      .withColumn("cum", sum("ntok").over(w))
      .withColumn("shard",
        floor((col("cum") - col("ntok")) / lit(budget.toDouble)).cast("long"))
      .drop("cum")
  }

  def tokenBudgeted(df: DataFrame, text: Column, id: Column, part: Column,
                    budget: Long): DataFrame =
    assignShards(df, text, id, part, budget)
      .groupBy("part", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"))
      .orderBy("part", "shard")
}
