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
}
