package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the latest right row whose
  * timestamp is <= the left row's timestamp, per join key — the standard
  * alignment operator for time series (sensor readings to the most recent
  * calibration, events to the last preceding order, ...).
  *
  * Spark has no ASOF JOIN; the idiomatic scalable form composes built-ins
  * (preference (a) over a custom operator): tag both sides, union, and run
  * one `last(_, ignoreNulls = true)` window per right column over
  * (key ORDER BY ts, side) — right rows sort before left rows at equal
  * timestamps, so matches are inclusive. ONE hash shuffle on the key, no
  * per-key loops, no broadcast of either side; skewed keys split by
  * Spark's window spill. A sort-merge-join formulation would need an
  * inequality join (O(n*m) per key); this stays O((n+m) log(n+m)) per key.
  */
object AsOf {

  /** @param left          left (probe) rows
    * @param right         right (reference) rows; should be unique per
    *                      (keys, rightTs) — pre-aggregate otherwise, or
    *                      matches among equal timestamps are unspecified
    * @param keys          equi-join key column names (present on both sides)
    * @param leftTs        left timestamp column (Long-comparable)
    * @param rightTs       right timestamp column
    * @param rightCols     right value columns to attach (null when no right
    *                      row precedes the left row)
    * @param toleranceUs   optional max staleness: matches older than
    *                      leftTs - tolerance are nulled out
    */
  def joinBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("__asof_side") && !leftCols.contains("__asof_ts"),
      "reserved column names")
    // The left timestamp travels as __asof_ts and is renamed back at the
    // end; carrying it twice would duplicate the column.
    val carriedLeftCols = leftCols.filterNot(c => keys.contains(c) || c == leftTs)

    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTs).as("__asof_ts") :+ lit(1).as("__asof_side")) ++
        carriedLeftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
        lit(null).cast("long").as("__asof_matched_ts"): _*)
    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTs).as("__asof_ts") :+ lit(0).as("__asof_side")) ++
        carriedLeftCols
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(col) :+
        col(rightTs).cast("long").as("__asof_matched_ts"): _*)

    // Right rows (side 0) sort before left rows (side 1) at equal
    // timestamps: backward matches are inclusive of ts equality.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts"), col("__asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedLeft.unionByName(taggedRight)
      .select(
        (keys.map(col) :+ col("__asof_ts") :+ col("__asof_side")) ++
          carriedLeftCols.map(col) ++
          rightCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)) :+
          last(col("__asof_matched_ts"), ignoreNulls = true).over(w)
            .as("__asof_matched_ts"): _*)
      .where(col("__asof_side") === 1)

    val withTolerance = toleranceUs match {
      case Some(tol) =>
        val stale = col("__asof_matched_ts").isNull ||
          (col("__asof_ts").cast("long") - col("__asof_matched_ts") > tol)
        carried.select(
          (keys.map(col) :+ col("__asof_ts")) ++
            carriedLeftCols.map(col) ++
            rightCols.map(c => when(stale, lit(null)).otherwise(col(c)).as(c)): _*)
      case None =>
        carried.select(
          (keys.map(col) :+ col("__asof_ts")) ++
            carriedLeftCols.map(col) ++
            rightCols.map(col): _*)
    }
    withTolerance.withColumnRenamed("__asof_ts", leftTs)
  }
}
