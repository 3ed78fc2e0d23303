package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters (SURVEY §2c.31c) — the
  * Misra-Gries summary (Misra & Gries 1982, "Finding repeated
  * elements") run per partition, then an exact recount of the
  * surviving candidates. The two-pass shape is what makes frequency
  * mining possible at 100 TB: pass 1 is a map-only scan whose state
  * is a bounded (k−1)-entry map per partition — never a shuffle of
  * the full token stream — and pass 2 re-scans with a broadcast
  * candidate filter and aggregates only matching rows.
  *
  * EXACTNESS GUARANTEE (why the output can be hash-oracled against a
  * plain GROUP BY ... HAVING): any item with global count > N/k must
  * exceed n_p/k in at least one partition p (pigeonhole over
  * Σn_p = N), and a Misra-Gries summary of capacity k−1 retains every
  * item whose local count exceeds n_p/k. So the candidate union is a
  * SUPERSET of the true heavy hitters, and the exact recount + final
  * `cnt·k > N` filter removes all false positives. No approximation
  * survives to the output.
  *
  * Candidate-set bound: ≤ partitions·(k−1) rows — driver- and
  * broadcast-sized for any sane k (the reference's freq/topFreq
  * surface, Dfs.scala:330-408, is the single-node analog: bitmap
  * popcounts answer exact frequencies; here the sketch pass bounds
  * memory instead of mmap).
  */
object HeavyHitters {

  /** per-partition Misra-Gries: capacity-(k−1) counter map over the
    * iterator; emits the surviving keys. Decrement-all is amortized
    * O(1) per element via the shared decrement counter technique —
    * but with k in the hundreds a direct map walk is already cheap
    * and simpler, so the textbook spelling is used.
    */
  private[graft] def misraGries(it: Iterator[String], k: Int): Iterator[String] =
    misraGriesFold(mutable.HashMap.empty[String, Long], it, k).keysIterator

  /** the MG fold itself, resumable from carried counters — shared by
    * the batch pass above and the streaming face
    * ([[graft.streaming.EventPipeline.heavyHittersStream]]), whose
    * state is the counter map between micro-batches (MG is a
    * streaming algorithm: folding batch N+1 into batch N's counters
    * IS the single-pass summary of the concatenated stream).
    */
  private[graft] def misraGriesFold(counters: mutable.HashMap[String, Long],
                                    it: Iterator[String],
                                    k: Int): mutable.HashMap[String, Long] = {
    while (it.hasNext) {
      val x = it.next()
      if (x != null) {
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1)
          case None =>
            if (counters.size < k - 1) counters.update(x, 1L)
            else {
              // decrement all; drop zeros
              val dead = mutable.ArrayBuffer.empty[String]
              counters.foreach { case (key, c) =>
                if (c == 1L) dead += key else counters.update(key, c - 1)
              }
              dead.foreach(counters.remove)
            }
        }
      }
    }
    counters
  }

  /** items of `item` (cast to string) whose exact count times k
    * STRICTLY exceeds the total row count, with their exact counts —
    * `(item, cnt)` ordered by (cnt desc, item asc).
    */
  def heavyHitters(df: DataFrame, item: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(item.cast("string").as("item"))
    // ONE Misra-Gries pass emits BOTH the surviving candidates and the
    // partition's row count n_p (a sentinel row with a null item), so
    // the grand total N = Σ n_p comes from the same scan — two scans
    // of the input total (this pass + the recount), not three.
    // localCheckpoint materializes the ≤ partitions·k-row summary so
    // the candidate and total branches below don't each re-run the
    // base-table pass.
    val summary = items.as[String]
      .mapPartitions { it =>
        var n = 0L
        val counting = it.map { x => n += 1; x }
        val survivors = misraGries(counting, k).toArray // drains `it`
        survivors.iterator.map(key => (key, 0L)) ++
          Iterator((null: String, n))
      }
      .toDF("item", "np").localCheckpoint()
    val cands = summary.where(col("item").isNotNull)
      .select("item").distinct()
    val total = summary.agg(sum("np").as("n")).select(col("n"))
    // exact recount restricted to candidates (broadcast: the
    // candidate set is ≤ partitions·(k−1) rows by construction)
    val counted = items.join(broadcast(cands), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
    counted.crossJoin(broadcast(total))
      .where(col("cnt") * lit(k.toLong) > col("n"))
      .select(col("item"), col("cnt"))
      .orderBy(desc("cnt"), asc("item"))
  }
}
