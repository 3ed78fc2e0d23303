package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** COLUMN PROFILING — the "what is in this table" statistics face of
  * the reference's per-column metadata (iodf keeps per-column typed
  * min/max/freq structure in its index entries, Dfs.scala:310-328;
  * here the same summary is computed declaratively, one row per
  * column).
  *
  * Each requested column gets ONE pruned single-column scan
  * aggregated to exactly one row (count / non-null / distinct /
  * min / max), then the per-column rows union. Min/max are computed
  * on the NATIVE type and cast to string only for the uniform output
  * schema — so ordering is typed (numeric, date), never
  * lexicographic-by-accident.
  *
  * Scale shape: N tiny independent jobs, each a columnar scan of one
  * column with map-side partial aggregation — embarrassingly
  * parallel, no shuffle beyond the 1-row-per-column final agg;
  * `count(distinct)` is the only two-phase pass. At 100 TB this is
  * the plan you want: column pruning means each pass reads only its
  * own column's pages.
  */
object Profile {

  /** one row per (name, expr): column, n_rows, n_nonnull, n_distinct,
    * min_s, max_s */
  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    cols.map { case (name, c) =>
      df.select(c.as("v"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("v")).as("n_nonnull"),
          countDistinct(col("v")).as("n_distinct"),
          min(col("v")).cast("string").as("min_s"),
          max(col("v")).cast("string").as("max_s"))
        .withColumn("column", lit(name))
        .select("column", "n_rows", "n_nonnull", "n_distinct",
          "min_s", "max_s")
    }.reduce(_ unionByName _).orderBy("column")
  }
}
