package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key caps for the pair-forming operators (minhash/simhash/
  * winnowing buckets, shingle joins, embedding LSH buckets): rows
  * whose key occurs more than `maxFreq` times are DROPPED before the
  * candidate self-join, bounding the join's per-key fan-out (a key
  * shared by c rows creates c² candidate pairs).
  *
  * Two spellings of the same row-set, selected by config:
  *
  * - GROUPED (default): per-key counts via groupBy (map-side partial
  *   aggregation collapses even a mega-hot key to one row per map
  *   task), keys over the cap become a broadcast LEFT ANTI join.
  *   Under any Zipf-like key distribution the over-cap set is tiny
  *   (it is the reason a cap exists), so the broadcast is bytes. The
  *   input subtree is evaluated twice (once for counts, once as the
  *   join probe side) — map-only work for every caller here — but NO
  *   key's row stream is ever concentrated in one task.
  *
  * - WINDOW (opt-in, `spark.graft.skew.windowCap=true`): a count
  *   window over partitionBy(keys). Evaluates the input once and
  *   forces the exact hashpartitioning the downstream self-join
  *   needs (one exchange, ReusedExchange) — but the hot key's ENTIRE
  *   stream funnels through one window partition (external sort,
  *   disk-bound) before being dropped. At a Zipf-heavy 100 TB corpus
  *   that straggler task is the first thing the operator hits, which
  *   is why this spelling is the opt-in rather than the default.
  *
  * The two spellings keep/drop IDENTICAL row sets (spec-checked), so
  * flipping the conf can never change operator results, only the
  * physical plan.
  */
object Skew {

  /** set to "true" to select the single-exchange window spelling */
  val WindowCapConf = "spark.graft.skew.windowCap"

  /** drop all rows of keys occurring more than `maxFreq` times */
  private[graft] def dropHotKeys(df: DataFrame, keys: Seq[String],
                                 maxFreq: Long): DataFrame =
    if (df.sparkSession.conf.getOption(WindowCapConf).exists(_.toBoolean))
      dropHotKeysWindow(df, keys, maxFreq)
    else dropHotKeysGrouped(df, keys, maxFreq)

  private[graft] def dropHotKeysGrouped(df: DataFrame, keys: Seq[String],
                                        maxFreq: Long): DataFrame = {
    val hot = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("kn"))
      .where(col("kn") > maxFreq)
      .select(keys.map(col): _*)
    df.join(broadcast(hot), keys, "left_anti")
  }

  private[graft] def dropHotKeysWindow(df: DataFrame, keys: Seq[String],
                                       maxFreq: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    df.withColumn("__kn", count(lit(1)).over(w))
      .where(col("__kn") <= maxFreq)
      .drop("__kn")
  }
}
