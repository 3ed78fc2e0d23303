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
  * sides, union, and per key take `last(right-row struct,
  * ignoreNulls)` over rows ordered by (time, right-before-left) —
  * `first` over the mirrored frame for forward. The struct packs the
  * payload with the matched right time, so the carried values and the
  * tolerance distance always come from the SAME picked row (a NULL
  * payload on the nearest row carries as NULL, as in pandas
  * merge_asof). ONE shuffle on the key, no row
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
    * @param toleranceTicks maximum time distance for a match, in the
    *                       SAME exact integral unit the direction
    *                       logic compares in (micros for timestamps,
    *                       days for dates, the raw value for integral
    *                       times). A match farther away carries NULL
    *                       payload — the left row is kept (the pandas
    *                       merge_asof tolerance contract). For
    *                       `nearest`, tolerance participates in the
    *                       PICK: if the closer side is out of
    *                       tolerance but the farther side is within,
    *                       the within side wins.
    */
  def join(left: DataFrame, leftKey: Column, leftTime: Column,
           right: DataFrame, rightKey: Column, rightTime: Column,
           rightPayload: Seq[(String, Column)],
           direction: String = "backward",
           toleranceTicks: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"asof direction must be backward|forward|nearest, got '$direction'")
    require(!rightPayload.exists(_._1 == "__rt"),
      "payload column name __rt is reserved")
    val leftCols = left.columns.toSeq
    // The payload columns AND the matched right time travel together
    // in ONE struct (`__pay`, non-null exactly on right rows): the
    // window picks the nearest right ROW, so a NULL payload value on
    // that row is carried as NULL — never silently replaced by an
    // older row's value that the tolerance check did not vet (the
    // pandas merge_asof contract).
    val l = left.select(
      (Seq(leftKey.as("__k"), leftTime.as("__t"), lit(0).as("__r")) ++
        leftCols.map(left(_))): _*)
    val r = right.select(
      Seq(rightKey.as("__k"), rightTime.as("__t"), lit(1).as("__r"),
        struct(rightPayload.map { case (n, c) => c.as(n) } :+
          rightTime.as("__rt"): _*).as("__pay")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    // backward: right rows sort BEFORE a left row at the same time
    // (equality is a match), scan looks back; forward mirrors it
    val wB = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__r").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // one window value per side — every payload column is a field
    // extraction from the same picked row (identical canonicalized
    // window expressions evaluate once per Window operator)
    val backRow = last(col("__pay"), ignoreNulls = true).over(wB)
    val fwdRow = first(col("__pay"), ignoreNulls = true).over(wF)
    def back(n: String) = backRow.getField(n)
    def fwd(n: String) = fwdRow.getField(n)
    // Distances are compared in an EXACT integral unit chosen by the
    // time column's type — micros for timestamps (a bare long cast
    // truncates to whole seconds and mis-picks on sub-second gaps),
    // days for dates (which cannot cast to long at all), the value
    // itself for integral types. `toleranceTicks` shares this unit.
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    lazy val toTicks: Column => Column = u.schema("__t").dataType match {
      case TimestampType | TimestampNTZType => c => unix_micros(c.cast("timestamp"))
      case DateType => c => datediff(c, lit("1970-01-01")).cast("long")
      case _ => c => c.cast("long")
    }
    lazy val t = toTicks(col("__t"))
    lazy val bt = toTicks(back("__rt"))
    lazy val ft = toTicks(fwd("__rt"))
    val carried: Seq[Column] = (direction, toleranceTicks) match {
      // no-tolerance backward/forward keep the bare window expression
      // (no when() wrapper, no tick math in the plan)
      case ("backward", None) => rightPayload.map { case (n, _) => back(n).as(n) }
      case ("forward", None)  => rightPayload.map { case (n, _) => fwd(n).as(n) }
      case ("backward", Some(tol)) => rightPayload.map { case (n, _) =>
        when(bt.isNotNull && (t - bt) <= tol, back(n)).as(n)
      }
      case ("forward", Some(tol)) => rightPayload.map { case (n, _) =>
        when(ft.isNotNull && (ft - t) <= tol, fwd(n)).as(n)
      }
      case ("nearest", tolOpt) =>
        // pick per ROW (one winner for all payload columns): the
        // closer VALID side, ties → backward; a side out of tolerance
        // is not a candidate at all, so the farther-but-within side
        // can win over the closer-but-beyond one
        val bValid = tolOpt.map(tol => bt.isNotNull && (t - bt) <= tol)
          .getOrElse(bt.isNotNull)
        val fValid = tolOpt.map(tol => ft.isNotNull && (ft - t) <= tol)
          .getOrElse(ft.isNotNull)
        rightPayload.map { case (n, _) =>
          when(bValid && (not(fValid) || (t - bt) <= (ft - t)), back(n))
            .when(fValid, fwd(n)).as(n)
        }
    }
    u.select((Seq(col("__r")) ++ leftCols.map(col) ++ carried): _*)
      .where(col("__r") === 0)
      .drop("__r")
  }
}
