package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular per-key event
  * stream onto a fixed-step grid with forward fill — the
  * "align sensor/metric streams before joining them" preparation
  * step (pandas `resample().ffill()`, TimescaleDB `time_bucket_gapfill`).
  *
  * Rule: each key's grid spans its own [first, last] bucket
  * (truncated to the step); a bucket with events reports the LAST
  * event's value (deterministic by (ts, id) — the as-of pick), an
  * empty bucket forward-fills the most recent prior value and is
  * flagged `filled`.
  *
  * Scale shape: the grid derives from a per-key min/max AGGREGATE
  * (tiny — one row per key) exploded map-side into bucket rows; the
  * event stream itself collapses to one row per (key, bucket) via
  * map-side-combinable max(struct(...)). Both sides then join on
  * (key, bucket) — uniform dense keys — and the forward fill is one
  * ignoreNulls last() window over the key's grid (bounded by
  * span/step rows per key, not by event count). A pathologically
  * long-lived key costs span/step grid rows, independent of its
  * event volume — the opposite skew profile of the raw stream.
  */
object Resample {

  /** `unit` is a calendar truncation unit (`hour`, `day`, `minute`)
    * — both the bucket key (date_trunc) and the grid stride
    * (INTERVAL 1 unit), so the grid aligns with the buckets by
    * construction on every engine.
    */
  def forwardFill(df: DataFrame, key: Column, ts: Column, id: Column,
                  value: Column, unit: String = "hour"): DataFrame = {
    require(Set("minute", "hour", "day")(unit), s"unsupported unit $unit")
    val ev = df.select(key.as("k"), date_trunc(unit, ts).as("bkt"),
      ts.as("ts"), id.as("id"), value.as("v"))
    // one row per (key, bucket): the last event's value, as-of style
    val perBucket = ev.groupBy("k", "bkt")
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("ts"), col("id"), col("v"))).as("m"))
      .select(col("k"), col("bkt"), col("n_events"), col("m.v").as("v"))
    val grid = ev.groupBy("k")
      .agg(min("bkt").as("lo"), max("bkt").as("hi"))
      .select(col("k"), explode(sequence(col("lo"), col("hi"),
        expr(s"INTERVAL 1 $unit"))).as("bkt"))
    val w = Window.partitionBy("k").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq("k", "bkt"), "left")
      .select(col("k").as("key"), col("bkt"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true).over(w).as("value"),
        col("v").isNull.as("filled"))
      .orderBy("key", "bkt")
  }
}
