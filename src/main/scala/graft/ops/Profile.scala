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
}
