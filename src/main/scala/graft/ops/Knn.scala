package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{IndexSpec, IndexedFrame}

/** Feature-weighted nearest neighbours — Spark-native re-expression
  * of the reference's Knn (/root/reference/src/main/scala/com/futurice/
  * iodf/ml/Knn.scala).
  *
  * The reference walks per-(field,value) bitmaps on one node:
  * weights from CoStats log-odds (Knn.scala:82-97), then a distance
  * accumulator array over rows (Knn.scala:28-69). Here both phases
  * are single grouped passes:
  *
  *  - [[keyValueWeights]]: one exploded scan → groupBy (field,value)
  *    with a conditional count of the target, cross-joined with the
  *    (broadcast, 1-row) global counts; the CoStats math is column
  *    expressions. No per-value bitmap ever exists.
  *  - [[topK]]: distance(e) = Σ_{kv∈e∩W} w1 + Σ_{kv∈v∩W} w2
  *    − Σ_{kv∈e∩v∩W} (w1+w2)  (equivalent to the reference's
  *    baseDistance/baseline bookkeeping) — an explode + broadcast
  *    join with the (small) weight table + per-row sum, then a
  *    global top-k. Scales as O(rows·fields), shuffles only the
  *    k-row result.
  */
object Knn {

  /** weight pair per (field, value) of `inFields` vs a target
    * predicate: (|ln(d(¬A,B)/d(¬A,¬B))|, |ln(d(A,B)/d(A,¬B))|) as in
    * reference Knn.scala:93-94 (A = feature present, B = target).
    *
    * `defined` is the reference's `outDefined` mask (Knn.scala:87-97:
    * `CoStats(bits & outDefined, outTrues, outDefined.f)`): rows where
    * the target is not observable (e.g. null) are excluded from ALL
    * four CoStats counts, so null-heavy fields don't skew the weights.
    */
  def keyValueWeights(df: DataFrame, inFields: Seq[String], target: Column,
                      varDFilter: Double = 0.0,
                      defined: Column = lit(true)): DataFrame = {
    val dfd = df.where(defined)
    val totals = dfd.agg(count(lit(1)).as("n"), count_if(target).as("fb"))
    val pairs = inFields.map(f =>
      struct(lit(f).as("field"), col(f).cast("string").as("value")))
    val exploded = dfd.select(explode(array(pairs: _*)).as("fv"), target.as("t"))
      .select(col("fv.field").as("field"), col("fv.value").as("value"), col("t"))
      .groupBy("field", "value")
      .agg(count(lit(1)).as("fa"), count_if(col("t")).as("fab"))
    weightSelect(exploded.crossJoin(broadcast(totals)), varDFilter)
  }

  /** the weight expressions over a (field,value,fa,fab,n,fb) counts
    * frame — shared by the from-scratch and counts-served spellings
    * so both produce bit-identical doubles from equal counts
    */
  private def weightSelect(counts: DataFrame,
                           varDFilter: Double): DataFrame = {
    val e = new IndexedFrame.StatExprs
    counts.select(
        col("field"), col("value"),
        abs(log(e.dS(2) / e.dS(0))).as("w1raw"),
        abs(log(e.dS(3) / e.dS(1))).as("w2raw"))
      .where(col("w1raw") >= varDFilter)
      .select(col("field"), col("value"),
        round(col("w1raw"), 6).as("w1"), round(col("w2raw"), 6).as("w2"))
      .orderBy("field", "value")
  }

  /** the per-row-decomposable HALF of [[keyValueWeights]]: per-
    * (field,value) (fa, fab) counts plus one `__total__` sentinel row
    * carrying (n, fb). Counts SUM across segments and deletes net by
    * subtraction, so this is the `buildCounts` for a
    * [[graft.core.SegmentedAgg]] family — weights for a 100 TB store
    * refresh at O(ingest batch), not O(corpus)
    * ([[weightsFromCounts]] turns the netted counts into the weight
    * table, bit-identical to the from-scratch build).
    */
  def weightCounts(df: DataFrame, inFields: Seq[String], target: Column,
                   defined: Column = lit(true)): DataFrame = {
    val dfd = df.where(defined)
    val pairs = inFields.map(f =>
      struct(lit(f).as("field"), col(f).cast("string").as("value")))
    val per = dfd.select(explode(array(pairs: _*)).as("fv"), target.as("t"))
      .select(col("fv.field").as("field"), col("fv.value").as("value"),
        col("t"))
      .groupBy("field", "value")
      .agg(count(lit(1)).as("fa"), count_if(col("t")).as("fab"))
    val tot = dfd.agg(count(lit(1)).as("fa"), count_if(target).as("fab"))
      .select(lit("__total__").as("field"), lit("").as("value"),
        col("fa"), col("fab"))
    per.unionByName(tot)
  }

  /** weights from a netted [[weightCounts]] table: the `__total__`
    * row supplies (n, fb), every other row its (fa, fab) — the same
    * [[weightSelect]] expressions as [[keyValueWeights]], so equal
    * counts give bit-identical weights
    */
  def weightsFromCounts(counts: DataFrame,
                        varDFilter: Double = 0.0): DataFrame = {
    val totals = counts.where(col("field") === "__total__")
      .select(col("fa").as("n"), col("fab").as("fb"))
    val kv = counts.where(col("field") =!= "__total__")
    weightSelect(kv.crossJoin(broadcast(totals)), varDFilter)
  }

  /** Persisted weight table — the reference's build-once / query-many
    * contract (ml/Knn.scala:113 builds `Knn(df, ...)` once, :71 then
    * serves every `knn(k, v)` from the held weights). The weight
    * table is tiny (one row per distinct (field,value)), so it rides
    * as a snapshot-keyed parquet like the IVF centroids and PQ
    * codebooks: the first call fits and saves, every later call is a
    * driver-side `exists` + a small parquet scan — NO CoStats
    * aggregation in the steady-state query plan.
    *
    * `dir` should carry the source table's snapshot key (see
    * [[graft.core.Artifacts.tableSnapshotKey]]) so a regenerated
    * dataset rebuilds instead of serving stale weights.
    */
  def haveWeights(spark: org.apache.spark.sql.SparkSession, dir: String)
                 (build: => DataFrame): DataFrame =
    graft.core.Artifacts.haveParquet(spark, dir)(build)

  /** top-k rows by weighted feature distance for a query item given
    * as (field -> value) pairs. `idCol` must be a unique row key.
    * `rowFilter` is the reference's candidate filter
    * (`knn(k, v, filter)`, Knn.scala:71-76): only rows matching it
    * compete for the k slots — pushed into the scan, not applied
    * after ranking.
    */
  def topK(df: DataFrame, weights: DataFrame, inFields: Seq[String],
           queryKVs: Map[String, String], idCol: String, k: Int,
           rowFilter: Column = lit(true)): DataFrame = {
    val base = df.where(rowFilter)
    // the weight table feeds two plan branches (scoring join and the
    // baseline scalar). No cache: with persisted weights ([[haveWeights]])
    // both branches are tiny parquet scans; with fresh weights both
    // contain the identical groupBy(field,value) shuffle, so Catalyst's
    // ReuseExchange computes the weight scan once — the post-exchange
    // agg that "recomputes" is a few hundred rows. (The r2 persist()
    // here leaked CacheManager blocks for the session lifetime.)
    val w = weights.select(col("field"), col("value"), col("w1"), col("w2"),
        inQuery(queryKVs).as("in_query"))
    // baseline = Σ w2 over the query's own weighted features
    val pairs = inFields.map(f =>
      struct(lit(f).as("field"), col(f).cast("string").as("value")))
    val rowKV = base.select(col(idCol), explode(array(pairs: _*)).as("fv"))
      .select(col(idCol), col("fv.field").as("field"), col("fv.value").as("value"))
    val contrib = rowKV.join(broadcast(w), Seq("field", "value"))
      .groupBy(idCol)
      .agg(sum(when(col("in_query"), -col("w2")).otherwise(col("w1"))).as("score"))
    val baseline = w.where(col("in_query"))
      .agg(coalesce(sum("w2"), lit(0.0)).as("baseline"))
    base.select(col(idCol))
      .join(contrib, Seq(idCol), "left")
      .crossJoin(broadcast(baseline))
      .select(col(idCol),
        round(coalesce(col("score"), lit(0.0)) + col("baseline"), 6).as("distance"))
      .orderBy(col("distance"), col(idCol))
      .limit(k)
  }

  private def inQuery(queryKVs: Map[String, String]): Column =
    // foldLeft, not reduce: an EMPTY query map (every query feature
    // filtered out against the weight table) must score all rows at
    // the baseline, not throw on reduce-of-empty
    queryKVs.foldLeft(lit(false)) { case (acc, (f, v)) =>
      acc || (col("field") === f && col("value") === v)
    }
}
