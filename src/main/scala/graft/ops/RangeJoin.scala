package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed RANGE JOIN — the non-equi time-proximity join Spark's
  * built-in operators can only express as a BroadcastNestedLoopJoin
  * (reference analog: the per-row neighborhood scans iodf serves from
  * its sorted index entries, Dfs.scala:310-328 — re-expressed here as
  * a bounded bucket equi-join Catalyst can shuffle-hash).
  *
  * Problem shape: all pairs (a, b) with the same key and
  * `0 ≤ t_b − t_a ≤ tol`. A naive `a JOIN b ON |Δt| ≤ tol` has no
  * equi-condition, so Spark plans a nested-loop scan — quadratic per
  * key and a non-starter at 100 TB.
  *
  * The bucket trick: with bucket width = tol, an ordered pair
  * (t_a ≤ t_b) within tolerance can only land in the SAME bucket or
  * ADJACENT buckets (`b_b ∈ {b_a, b_a+1}`). So the EARLY side emits
  * each row into buckets {b, b+1} (one `explode`, ×2 — bounded, not
  * data-dependent), the LATE side into {b} alone, and the join becomes
  * a plain equi-join on (key, bucket) that shuffles/broadcasts like
  * any other — followed by the exact `0 ≤ Δ ≤ tol` residual filter.
  * Each qualifying pair is produced EXACTLY once (the late row's
  * bucket is unique, and the early row hits it via b when co-bucketed,
  * via b+1 when one bucket behind) — no dedup pass needed.
  *
  * Ties (t_a = t_b) are canonically ordered by id so a pair never
  * appears twice and self-pairs never appear at all.
  *
  * Scale shape: 2 n + n rows shuffled on (key, bucket) — a UNIFORM
  * key unless one (key, tol-window) is pathologically hot, which is a
  * data property (that many events genuinely collide), not a plan
  * defect; output is the true pair count, which the caller bounds by
  * choosing tol.
  */
object RangeJoin {

  /** All ordered same-key pairs within `tolUs` ticks: columns
    * (key, id_a, id_b, gap_us), gap = t_b − t_a ∈ [0, tolUs], pairs
    * canonical by (t, id). */
  def selfWithin(df: DataFrame, key: Column, ts: Column, id: Column,
                 tolUs: Long): DataFrame = {
    require(tolUs > 0, s"tolerance must be positive, got $tolUs")
    val typed = df.select(key.as("__k"), ts.as("__t"), id.as("__id"))
    // timestamp/date/numeric → exact long ticks (µs for timestamps),
    // the AsOf.scala:99 protocol
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    val ticks: Column => Column = typed.schema("__t").dataType match {
      case TimestampType | TimestampNTZType =>
        c => unix_micros(c.cast("timestamp"))
      case DateType => c => datediff(c, lit("1970-01-01")).cast("long")
      case _ => c => c.cast("long")
    }
    val base = typed.select(col("__k"), ticks(col("__t")).as("__us"),
      col("__id"))
    // floor-div on longs (ticks are non-negative epoch µs here; `div`
    // keeps the arithmetic integer-exact end to end)
    val bucket = expr(s"__us div ${tolUs}L")
    val early = base.select(col("__k"), col("__us").as("__ua"),
      col("__id").as("id_a"),
      explode(array(bucket, bucket + 1L)).as("__b"))
    val late = base.select(col("__k"), col("__us").as("__ub"),
      col("__id").as("id_b"), bucket.as("__b"))
    early.join(late, Seq("__k", "__b"))
      .where(col("__ub") >= col("__ua") &&
        col("__ub") - col("__ua") <= tolUs &&
        (col("__ua") < col("__ub") || col("id_a") < col("id_b")))
      .select(col("__k").as("key"), col("id_a"), col("id_b"),
        (col("__ub") - col("__ua")).as("gap_us"))
  }
}
