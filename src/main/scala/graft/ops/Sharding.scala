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

  /** Concat-and-chunk context-window statistics — the OTHER packing
    * rule training pipelines use: docs are concatenated in id order
    * within each part and the token stream is cut into fixed
    * `contextLen` windows, docs straddling cuts (the GPT-style
    * "packed sequences" layout, vs [[assignShards]]' no-straddle
    * shards). Emits per-(part, chunk): how many docs touch the
    * window, how many START in it (the document-boundary-per-context
    * rate people tune contextLen against), and how many of its token
    * slots are covered (only a part's final chunk is ever partial).
    *
    * Shape: one per-part running-sum window (same scale argument as
    * [[assignShards]]), then each doc explodes into only the chunks
    * it overlaps (≤ ntok/contextLen + 1 rows), then one (part, chunk)
    * hash aggregate with map-side combine. Zero-token docs span no
    * chunk and are dropped before the explode.
    */
  def contextChunks(df: DataFrame, text: Column, id: Column, part: Column,
                    contextLen: Long): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive, got $contextLen")
    val w = Window.partitionBy("part").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val L = lit(contextLen)
    df.select(part.as("part"), id.as("doc_id"),
        size(split(text, " ")).cast("long").as("ntok"))
      .withColumn("e", sum("ntok").over(w))
      .withColumn("st", col("e") - col("ntok"))
      .where(col("ntok") > 0)
      .withColumn("chunk",
        explode(sequence(floor(col("st") / L).cast("long"),
          floor((col("e") - 1) / L).cast("long"))))
      .groupBy("part", "chunk")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(floor(col("st") / L).cast("long") === col("chunk"), 1L)
          .otherwise(0L)).as("n_starts"),
        sum(least(col("e"), (col("chunk") + 1) * L)
          - greatest(col("st"), col("chunk") * L)).as("n_tokens"))
      .orderBy("part", "chunk")
  }

  /** Length-bucketed BATCHING for padded training/inference: within
    * each part, docs sort by (ntok DESC, doc_id) and split into
    * fixed-size batches of `batchSize`; per batch: doc count, max and
    * total tokens, and padding waste = n·max − Σntok — the quantity
    * length-sorted batching minimizes vs arrival-order batching
    * (every batch pads to its own max, and sorting makes batch
    * members similar-length). Integer-exact throughout; same
    * per-part window posture as [[assignShards]] (never a global
    * sort — parts parallelize, and at 100 TB the part key is
    * (source, shard-range) so each window is bounded).
    */
  def lengthBatches(df: DataFrame, text: Column, id: Column, part: Column,
                    batchSize: Long = 32L): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val w = Window.partitionBy("part").orderBy(desc("ntok"), asc("doc_id"))
    df.select(part.as("part"), id.as("doc_id"),
        size(split(text, " ")).cast("long").as("ntok"))
      .withColumn("batch",
        floor((row_number().over(w) - 1).cast("long") /
          lit(batchSize.toDouble)).cast("long"))
      .groupBy("part", "batch")
      .agg(count(lit(1)).as("n_docs"),
        max(col("ntok")).as("max_tok"),
        sum(col("ntok")).as("n_tokens"),
        (count(lit(1)) * max(col("ntok")) - sum(col("ntok"))).as("pad_waste"))
      .orderBy("part", "batch")
  }
}
