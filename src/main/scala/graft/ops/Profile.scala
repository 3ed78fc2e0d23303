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

  /** Pairwise Pearson correlation matrix over numeric columns (§2b)
    * — the multivariate face of [[graft.core.CoStats]] (the reference
    * keeps pairwise co-statistics per indexed value pair,
    * CoStats.scala:7-35; here the columns themselves are the
    * variables). One row per unordered pair (i < j in the given
    * order): col_x, col_y, n, corr.
    *
    * Cross-engine exactness: every moment (Σx, Σx², Σxy) is summed in
    * DECIMAL(18,6) — exact, order-independent — and only the FINAL
    * Pearson formula runs in double (identical IEEE expression on
    * both engines), rounded to 6 places. A plain double Σ would hash
    * differently per accumulation order (SURVEY §6's money-sum rule,
    * applied to second moments).
    *
    * Scale shape: ONE full-table aggregation pass computes all
    * k + k(k+1)/2 moments map-side-combinably (a single 1-row
    * result); the pair explosion happens on that 1-row frame. No
    * shuffle of data rows beyond the partial-agg merge.
    */
  def corrMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    def dec(c: Column): Column = c.cast("decimal(18,6)")
    val moments =
      (count(lit(1)).as("n") +:
        cols.map { case (nm, c) => sum(dec(c)).as(s"s_$nm") }) ++
      (for { i <- cols.indices; j <- i until cols.size } yield {
        val (ni, ci) = cols(i); val (nj, cj) = cols(j)
        sum(dec(ci) * dec(cj)).as(s"p_${ni}_$nj")
      })
    val one = df.agg(moments.head, moments.tail: _*)
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size } yield {
      val (nx, _) = cols(i); val (ny, _) = cols(j)
      val nd = col("n").cast("double")
      val sx = col(s"s_$nx").cast("double")
      val sy = col(s"s_$ny").cast("double")
      val sxx = col(s"p_${nx}_$nx").cast("double")
      val syy = col(s"p_${ny}_$ny").cast("double")
      val sxy = col(s"p_${nx}_$ny").cast("double")
      struct(lit(nx).as("col_x"), lit(ny).as("col_y"), col("n").as("n"),
        round((nd * sxy - sx * sy) /
          (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)), 6)
          .as("corr"))
    }
    one.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col_x").as("col_x"), col("p.col_y").as("col_y"),
        col("p.n").as("n"), col("p.corr").as("corr"))
      .orderBy("col_x", "col_y")
  }

  /** Per-group ordinary-least-squares TREND line — "is this segment
    * growing?" over an already-aggregated integer series (the
    * caller supplies exact long `x` (e.g. a month index) and `y`
    * (e.g. revenue cents); aggregating the fact table FIRST is what
    * keeps the moments in long range). Returns per group: n, slope,
    * intercept — each the closed normal-equation form as ONE RAW
    * IEEE division of exact integer moments
    * (slope = (nΣxy−ΣxΣy)/(nΣxx−Σx²)). Deliberately NOT rounded:
    * identical exact longs cast to identical doubles and one IEEE
    * division is bit-deterministic on every engine, while a
    * decimal round of a large-magnitude quotient (intercepts reach
    * e9 cents) asks for digits past double precision and the
    * engines' rounding algorithms disagree in the last ulp (seen at
    * the 3× gate). Degenerate groups (a single distinct x) yield
    * NULL slope/intercept on both engines.
    *
    * Scale shape: one map-side-combinable aggregation on the group
    * key — 5 long sums per group, no window, no second pass.
    */
  def groupTrend(df: DataFrame, grp: Column, x: Column,
                 y: Column): DataFrame = {
    val m = df.select(grp.as("grp"), x.as("x"), y.as("y"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
    val den = (col("n") * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    m.select(col("grp"), col("n"),
        when(den === 0.0, lit(null).cast("double")).otherwise(
          (col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double") / den).as("slope"),
        when(den === 0.0, lit(null).cast("double")).otherwise(
          (col("sy") * col("sxx") - col("sx") * col("sxy"))
            .cast("double") / den).as("intercept"))
      .orderBy("grp")
  }

  /** Equi-width integer histogram — the profiling complement of
    * [[profile]]'s min/max (distribution shape, not just range).
    * `value` must be an exact long (cents/micros per the money
    * protocol); bucket boundaries derive from the corpus min/max as
    * floored integer arithmetic — bucket = (v−min)·nb div
    * (max−min+1), all operands non-negative so truncating and
    * floored division agree cross-engine. Returns one row per
    * non-empty bucket: bucket, n, v_min, v_max.
    *
    * Scale shape: min/max is one map-side-combinable 1-row pass
    * broadcast back (the RFM recency pattern); the bucket pass is
    * map-only + one nb-row aggregation. Two scans total, no window,
    * no sort — at 100 TB the two passes pipeline as pure columnar
    * scans of the one column.
    */
  def histogram(df: DataFrame, value: Column, buckets: Int = 10): DataFrame = {
    require(buckets >= 1)
    val v = df.select(value.as("v")).where(col("v").isNotNull)
    val mm = v.agg(min("v").as("mn"), max("v").as("mx"))
    v.crossJoin(broadcast(mm))
      .select(least(
        expr(s"((v - mn) * $buckets) div (mx - mn + 1)"),
        lit(buckets - 1).cast("long")).as("bucket"), col("v"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("v").as("v_min"), max("v").as("v_max"))
      .orderBy("bucket")
  }
}
