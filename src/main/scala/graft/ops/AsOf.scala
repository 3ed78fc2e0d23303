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
    * @param bucketTicks skew guard: sub-partition each key's window
    *                       by time buckets of this width (same unit
    *                       as toleranceTicks). The per-task sort
    *                       bound drops from O(rows-per-key) to
    *                       O(rows-per-key-per-bucket); bucket
    *                       boundaries are patched with a carried
    *                       last/first right row from neighbouring
    *                       buckets (a window over bucket COUNTS per
    *                       key, never over data rows), so results are
    *                       IDENTICAL to the plain path for every
    *                       direction and tolerance (AsOfSpec asserts
    *                       equality; planted-hot-key numbers in
    *                       SURVEY §5). Pick a width so a hot key's
    *                       densest bucket fits a task — e.g. one hour
    *                       for a key with 100M events/year.
    */
  def join(left: DataFrame, leftKey: Column, leftTime: Column,
           right: DataFrame, rightKey: Column, rightTime: Column,
           rightPayload: Seq[(String, Column)],
           direction: String = "backward",
           toleranceTicks: Option[Long] = None,
           bucketTicks: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"asof direction must be backward|forward|nearest, got '$direction'")
    require(bucketTicks.forall(_ > 0), "bucketTicks must be positive")
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
    // Distances are compared in an EXACT integral unit chosen by the
    // time column's type — micros for timestamps (a bare long cast
    // truncates to whole seconds and mis-picks on sub-second gaps),
    // days for dates (which cannot cast to long at all), the value
    // itself for integral types. `toleranceTicks`/`bucketTicks` share
    // this unit.
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    lazy val toTicks: Column => Column = u.schema("__t").dataType match {
      case TimestampType | TimestampNTZType => c => unix_micros(c.cast("timestamp"))
      case DateType => c => datediff(c, lit("1970-01-01")).cast("long")
      case _ => c => c.cast("long")
    }
    // per-direction "picked right row" struct + the frame it lives
    // over: the plain path windows on the key alone; the bucketed
    // path (the skew guard — see class doc) sub-partitions on
    // (key, time bucket) and patches bucket boundaries with a
    // carried struct from neighbouring buckets.
    val (uu, backRow, fwdRow): (DataFrame, Column, Column) =
      bucketTicks match {
        case None =>
          // backward: right rows sort BEFORE a left row at the same
          // time (equality is a match), scan looks back; forward
          // mirrors it
          val wB = Window.partitionBy("__k")
            .orderBy(col("__t").asc, col("__r").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          // forward = the REVERSED-sort running frame, not
          // first() over (currentRow, unboundedFollowing): Spark's
          // UnboundedFollowing frame re-aggregates the remaining
          // partition for EVERY row — O(rows²) per key, a hot-key
          // scale hazard (r15 optimization round). Sorting
          // (t desc, r desc) makes [unboundedPreceding, currentRow]
          // contain exactly the rows (t', r') ≥ (t, r) of the asc
          // order — including same-t right rows (r=1 sorts before
          // the left row's 0 in desc, as asc put it after) and the
          // null-time rows (asc nulls-first excluded them from the
          // forward frame; desc nulls-last keeps them excluded) —
          // so the running last() picks the IDENTICAL row in O(rows).
          val wF = Window.partitionBy("__k")
            .orderBy(col("__t").desc, col("__r").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          (u, last(col("__pay"), ignoreNulls = true).over(wB),
            last(col("__pay"), ignoreNulls = true).over(wF))
        case Some(width) =>
          // floor division in exact long arithmetic (a double divide
          // drifts near 2^53); a NULL time yields a NULL bucket,
          // which sorts first and never feeds the carry (max_by
          // ignores NULL orderings), matching the plain path's
          // nulls-first window semantics
          val tk = toTicks(col("__t"))
          // (tk - floorMod) is an exact multiple of width, so the
          // double divide is exact below 2^53; cast back to long
          val ub = u.withColumn("__b",
            ((tk - ((tk % width + width) % width)) / width).cast("long"))
          // per (key, bucket): the latest/earliest right ROW of the
          // bucket, then the cross-bucket carry — a window over
          // BUCKET COUNTS per key, never over data rows
          val perB = ub.groupBy("__k", "__b").agg(
            max_by(col("__pay"), when(col("__r") === 1, col("__t")))
              .as("__bp"),
            min_by(col("__pay"), when(col("__r") === 1, col("__t")))
              .as("__fp"))
          val wCb = Window.partitionBy("__k").orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)
          // reversed-sort running frame instead of the quadratic
          // (1, unboundedFollowing) — same linearization as wF below
          val wCf = Window.partitionBy("__k").orderBy(col("__b").desc)
            .rowsBetween(Window.unboundedPreceding, -1)
          val carry = perB.select(col("__k"), col("__b"),
            last(col("__bp"), ignoreNulls = true).over(wCb).as("__cb"),
            last(col("__fp"), ignoreNulls = true).over(wCf).as("__cf"))
          // the (k,b) join reuses the window's (k,b) clustering on
          // the data side; the carry side is bucket-count-sized
          val joined = ub.join(carry, Seq("__k", "__b"), "left")
          val wBb = Window.partitionBy("__k", "__b")
            .orderBy(col("__t").asc, col("__r").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          // reversed-sort running frame — see wF above
          val wFb = Window.partitionBy("__k", "__b")
            .orderBy(col("__t").desc, col("__r").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          (joined,
            coalesce(
              last(col("__pay"), ignoreNulls = true).over(wBb), col("__cb")),
            coalesce(
              last(col("__pay"), ignoreNulls = true).over(wFb), col("__cf")))
      }
    // one window value per side — every payload column is a field
    // extraction from the same picked row (identical canonicalized
    // window expressions evaluate once per Window operator)
    def back(n: String) = backRow.getField(n)
    def fwd(n: String) = fwdRow.getField(n)
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
    uu.select((Seq(col("__r")) ++ leftCols.map(col) ++ carried): _*)
      .where(col("__r") === 0)
      .drop("__r")
  }
}
