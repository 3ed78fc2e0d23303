package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the right row with
  * the same key that is nearest in time on the requested side:
  * `backward` (default): most recent right with right.time <=
  * left.time; `forward`: earliest right with right.time >= left.time;
  * `nearest`: whichever of the two is closer (ties → backward).
  *
  * Spark has no native ASOF JOIN; the naive range-join spelling
  * (`l.key = r.key AND r.t <= l.t` + a per-row max) explodes to a
  * range join with O(|l|·|r|/keys) intermediate rows. This operator
  * uses the union + ordered-window formulation instead: tag both
  * sides, union, and per key take `last(right payload, ignoreNulls)`
  * over rows ordered by (time, right-before-left) — `first` over the
  * mirrored frame for forward. ONE shuffle on the key, no row
  * explosion — the shape that survives a fact-fact point-in-time join
  * at 100 TB. (`nearest` evaluates both frames over the same
  * partitioning: one exchange, two window sorts.)
  *
  * Right rows must be unique per (key, time) — pre-aggregate the
  * right side (the caller picks the tie-break, e.g. max id per
  * timestamp); otherwise which same-timestamp row wins is
  * unspecified, exactly as in other engines' ASOF.
  */
object AsOf {

  /** @param rightPayload right-side columns to carry (name → column),
    *                     evaluated against `right`
    * @param direction "backward" | "forward" | "nearest"
    */
  def join(left: DataFrame, leftKey: Column, leftTime: Column,
           right: DataFrame, rightKey: Column, rightTime: Column,
           rightPayload: Seq[(String, Column)],
           direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"asof direction must be backward|forward|nearest, got '$direction'")
    val leftCols = left.columns.toSeq
    // `nearest` carries the matched right TIME alongside the payload
    // (the `__rt` column in the r select below) to compare distances;
    // the plain directions drop it
    val l = left.select(
      (Seq(leftKey.as("__k"), leftTime.as("__t"), lit(0).as("__r")) ++
        leftCols.map(left(_))): _*)
    val r = right.select(
      (Seq(rightKey.as("__k"), rightTime.as("__t"), lit(1).as("__r")) ++
        rightPayload.map { case (n, c) => c.as(n) } :+
        rightTime.as("__rt")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    // backward: right rows sort BEFORE a left row at the same time
    // (equality is a match), scan looks back; forward mirrors it
    val wB = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__r").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def back(n: String) = last(col(n), ignoreNulls = true).over(wB)
    def fwd(n: String) = first(col(n), ignoreNulls = true).over(wF)
    val carried: Seq[Column] = direction match {
      case "backward" => rightPayload.map { case (n, _) => back(n).as(n) }
      case "forward"  => rightPayload.map { case (n, _) => fwd(n).as(n) }
      case "nearest" =>
        // pick per ROW (one winner for all payload columns): backward
        // unless forward exists and is strictly closer. Distances are
        // compared in an EXACT integral unit chosen by the time
        // column's type — micros for timestamps (a bare long cast
        // truncates to whole seconds and mis-picks on sub-second
        // gaps), days for dates (which cannot cast to long at all),
        // the value itself for integral types.
        import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
        val toTicks: Column => Column = u.schema("__t").dataType match {
          case TimestampType | TimestampNTZType => c => unix_micros(c.cast("timestamp"))
          case DateType => c => datediff(c, lit("1970-01-01")).cast("long")
          case _ => c => c.cast("long")
        }
        val t = toTicks(col("__t"))
        val bt = toTicks(back("__rt"))
        val ft = toTicks(fwd("__rt"))
        val takeBack = ft.isNull ||
          (bt.isNotNull && (t - bt) <= (ft - t))
        rightPayload.map { case (n, _) =>
          when(takeBack, back(n)).otherwise(fwd(n)).as(n)
        }
    }
    u.select((Seq(col("__r")) ++ leftCols.map(col) ++ carried): _*)
      .where(col("__r") === 0)
      .drop("__r")
  }
}
