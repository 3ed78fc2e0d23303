package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Analytics, LlmOps, Oracles, OraclesLlm, RefSurface}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §6
  * (correctness protocol). Each entry in [[queries]] is one §2 row;
  * [[oracleSql]] holds the DuckDB mirror for hash-checked rows.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.queries("q5_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefSurface.queries ++ Analytics.queries ++ LlmOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.all ++ OraclesLlm.all
}
