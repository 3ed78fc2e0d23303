package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the most recent
  * right row with the same key and right.time <= left.time.
  *
  * Spark has no native ASOF JOIN; the naive range-join spelling
  * (`l.key = r.key AND r.t <= l.t` + a per-row max) explodes to a
  * range join with O(|l|·|r|/keys) intermediate rows. This operator
  * uses the union + ordered-window formulation instead: tag both
  * sides, union, and per key take `last(right payload, ignoreNulls)`
  * over rows ordered by (time, right-before-left). ONE shuffle on the
  * key, no row explosion — the shape that survives a fact-fact
  * point-in-time join at 100 TB.
  *
  * Right rows must be unique per (key, time) — pre-aggregate the
  * right side (the caller picks the tie-break, e.g. max id per
  * timestamp); otherwise which same-timestamp row wins is
  * unspecified, exactly as in other engines' ASOF.
  */
object AsOf {

  /** @param rightPayload right-side columns to carry (name → column),
    *                     evaluated against `right`
    */
  def join(left: DataFrame, leftKey: Column, leftTime: Column,
           right: DataFrame, rightKey: Column, rightTime: Column,
           rightPayload: Seq[(String, Column)]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(
      (Seq(leftKey.as("__k"), leftTime.as("__t"), lit(0).as("__r")) ++
        leftCols.map(left(_))): _*)
    val r = right.select(
      (Seq(rightKey.as("__k"), rightTime.as("__t"), lit(1).as("__r")) ++
        rightPayload.map { case (n, c) => c.as(n) }): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.map { case (n, _) =>
      last(col(n), ignoreNulls = true).over(w).as(n)
    }
    u.select((Seq(col("__r")) ++ leftCols.map(col) ++ carried): _*)
      .where(col("__r") === 0)
      .drop("__r")
  }
}
