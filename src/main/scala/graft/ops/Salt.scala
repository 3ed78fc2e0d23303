package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys (SURVEY §5).
  *
  * A groupBy on a power-law key sends an entire hot key to one
  * reducer. Salting splits each key into `buckets` sub-keys for the
  * first (heavy) aggregation, then combines the per-salt partials —
  * two shuffles, but the biggest reducer shrinks by ~buckets×. Use
  * when AQE's skew handling isn't available (pre-3.2 clusters) or for
  * deterministic plan shape; the salt is a hash of stable columns,
  * not a random number, so results are reproducible.
  */
object Salt {

  /** salted two-stage sum/count aggregation: equivalent to
    * df.groupBy(key).agg(count, sum(valueCol)) for any salt width.
    */
  def saltedAgg(df: DataFrame, key: Column, valueCol: Column,
                saltFrom: Column, buckets: Int = 16): DataFrame =
    df.select(key.as("k"), valueCol.as("v"),
        pmod(hash(saltFrom), lit(buckets)).as("salt"))
      .groupBy("k", "salt")
      .agg(count(lit(1)).as("pn"), sum("v").as("pv"))
      .groupBy("k")
      .agg(sum("pn").as("n"), sum("pv").as("total"))

  /** salted equi-join for a skewed FACT side: the fact rows carry a
    * deterministic salt in [0, buckets), the dim side is replicated
    * buckets× (one explode — dim tables are the small side by
    * definition, so the blow-up is bounded), and the join key becomes
    * (key, salt). Result rows are IDENTICAL to the plain equi-join —
    * only the shuffle partitioning changes: a hot key that would land
    * 100M fact rows on one reducer now spreads over `buckets`
    * reducers, each matched by its own dim replica.
    *
    * Use when the dim side is too big to broadcast outright but the
    * fact side's key distribution is power-law and AQE skew handling
    * is unavailable (sort-merge path). `factCols`/`dimCols` name the
    * payload columns to carry through.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: Column, dimKey: Column,
                 factCols: Seq[(String, Column)],
                 dimCols: Seq[(String, Column)],
                 saltFrom: Column, buckets: Int = 16): DataFrame = {
    val f = fact.select(
      (factKey.as("__k") +: pmod(hash(saltFrom), lit(buckets)).as("__salt") +:
        factCols.map { case (n, c) => c.as(n) }): _*)
    val d = dim.select(
      (dimKey.as("__k") +:
        explode(array((0 until buckets).map(lit): _*)).as("__salt") +:
        dimCols.map { case (n, c) => c.as(n) }): _*)
    f.join(d, Seq("__k", "__salt")).drop("__salt")
      .withColumnRenamed("__k", "key")
  }
}
