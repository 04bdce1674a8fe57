package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Models, TimestampCodec}

/** Segment-native aggregates: COUNT/MIN/MAX/SUM/AVG of one field computed
  * directly from segment metadata and models, skipping reconstruction.
  *
  * Spark-first port of the reference's `ModelSimpleAggregates` physical
  * optimizer rule
  * (/root/reference/crates/modelardb_storage/src/optimizer/model_simple_aggregates.rs:175-618):
  * instead of swapping physical operators, the facade emits the aggregate
  * over the segment DataFrame — MIN/MAX reduce to built-ins over the
  * metadata columns, COUNT/SUM go through a codegen'd-adjacent UDF per
  * segment with Spark's native partial aggregation on top.
  */
object SegmentAggregates {

  import org.apache.spark.sql.graft.ColumnBridge

  private def attr(name: String) = ColumnBridge.expression(col(name))

  /** Data points represented by a segment, decoded without gridding. */
  def lenCol: Column = ColumnBridge.column(
    SegmentLen(attr("start_time"), attr("end_time"), attr("timestamps")))

  /** Sum of a segment's values, f64-accumulated so the cross-segment total
    * matches an exact engine summing the reconstructed values.
    */
  def sumCol: Column = ColumnBridge.column(SegmentSum(
    attr("model_type_id"), attr("start_time"), attr("end_time"),
    attr("timestamps"), attr("min_value"), attr("max_value"),
    attr("values"), attr("residuals")))

  /** (Σv, m2) struct of a segment's values in ONE decode pass — m2 the
    * CENTERED second moment Σ(v − mean_seg)², the shared partial behind
    * the VAR/STDDEV closed forms (merged with [[PartialM2Merge]], never
    * the cancellation-prone raw Σv²).
    */
  def sumStatsCol: Column = ColumnBridge.column(SegmentSumStats(
    attr("model_type_id"), attr("start_time"), attr("end_time"),
    attr("timestamps"), attr("min_value"), attr("max_value"),
    attr("values"), attr("residuals")))

  /** (first, last) values of a segment in ONE decode pass — the kernel
    * behind segment-native FIRST/LAST by time (min_by/max_by on ts).
    */
  def edgeValuesCol: Column = ColumnBridge.column(SegmentEdgeValues(
    attr("model_type_id"), attr("start_time"), attr("end_time"),
    attr("timestamps"), attr("min_value"), attr("max_value"),
    attr("values"), attr("residuals")))

  /** True when a segment can hide a NaN value behind non-NaN stored bounds
    * (bounds are written NaN-ignoring): only MacaqueV value streams and
    * residual tails can — a fitted PMC/Swing model's own NaN shows in its
    * stored bounds.
    */
  private def nanCapable: Column =
    col("model_type_id") === lit(graft.core.Models.MacaqueVId.toInt) ||
      length(col("residuals")) > 0

  /** True when the segment's stored bounds prove every value is outside
    * (lower, upper]. Bound semantics are Spark's own comparison semantics
    * (NaN greatest, -0 = 0 — matching [[graft.core.ValueCounts.sqlCompare]]):
    * all-NaN fitted segments carry NaN bounds and compare accordingly. A
    * HIDDEN NaN (NaN behind non-NaN bounds, MacaqueV/residual-tail only)
    * is above any non-NaN `upper`, so `max <= lower` still proves 0 —
    * EXCEPT when `upper` is the unbounded (NaN) sentinel, which includes
    * NaN values.
    */
  private def allOutCol(lower: Double, upper: Double): Column =
    if (upper.isNaN) col("max_value") <= lower && !nanCapable
    else col("max_value") <= lower || col("min_value") > upper

  /** Count of a segment's reconstructed values in (lower, upper] under SQL
    * comparison semantics ([[graft.core.ValueCounts.countInRange]]; upper
    * = Double.NaN means unbounded, including NaN values) — the partial
    * behind segment-native value-predicate COUNT. Most segments never
    * decode: the stored value bounds answer entirely-out (0) and, for
    * segments that cannot hide NaN, entirely-in (len, timestamps-only)
    * directly; only bound-straddling segments evaluate the kernel, which
    * is itself closed-form for PMC and O(log len) for Swing.
    */
  def countInRangeCol(lower: Double, upper: Double): Column = {
    val kernel = ColumnBridge.column(SegmentCountInRange(
      lower, upper, Long.MinValue, Long.MaxValue,
      attr("model_type_id"), attr("start_time"), attr("end_time"),
      attr("timestamps"), attr("min_value"), attr("max_value"),
      attr("values"), attr("residuals")))
    when(allOutCol(lower, upper), lit(0L))
      .when(!nanCapable && col("min_value") > lower &&
        col("max_value") <= upper, lenCol)
      .otherwise(kernel)
  }

  /** Range-clipped [[countInRangeCol]] for boundary segments: the kernel
    * applies the timestamp window exactly (O(1) index arithmetic for
    * regular segments), the bounds still short-circuit entirely-out
    * segments to zero without touching timestamps.
    */
  def countInRangeClippedCol(lower: Double, upper: Double,
      tsLo: Long, tsHi: Long): Column = {
    val kernel = ColumnBridge.column(SegmentCountInRange(
      lower, upper, tsLo, tsHi,
      attr("model_type_id"), attr("start_time"), attr("end_time"),
      attr("timestamps"), attr("min_value"), attr("max_value"),
      attr("values"), attr("residuals")))
    when(allOutCol(lower, upper), lit(0L)).otherwise(kernel)
  }

  /** [[countInRangeCol]] with PER-ROW bounds (columns of a broadcast-joined
    * statistics frame): same metadata fast paths, decided with columnar
    * comparisons — the partial behind per-group dynamic thresholds. NULL
    * bounds fall through to the kernel (unbounded).
    */
  def countBetweenCol(lowerCol: Column, upperCol: Column,
      tsLo: Long = Long.MinValue, tsHi: Long = Long.MaxValue): Column = {
    val kernel = ColumnBridge.column(SegmentCountBetween(
      ColumnBridge.expression(lowerCol), ColumnBridge.expression(upperCol),
      tsLo, tsHi,
      attr("model_type_id"), attr("start_time"), attr("end_time"),
      attr("timestamps"), attr("min_value"), attr("max_value"),
      attr("values"), attr("residuals")))
    val clipped = tsLo != Long.MinValue || tsHi != Long.MaxValue
    val allOut =
      when(isnan(upperCol), col("max_value") <= lowerCol && !nanCapable)
        .otherwise(col("max_value") <= lowerCol || col("min_value") > upperCol)
    val allIn =
      if (clipped) lit(false) // a clipped all-in still needs the clipped len
      else !nanCapable &&
        col("min_value") > lowerCol && col("max_value") <= upperCol
    when(coalesce(allOut, lit(false)), lit(0L))
      .when(coalesce(allIn, lit(false)), lenCol)
      .otherwise(kernel)
  }

  /** (cnt, sum, mn, mx) struct of a segment's values inside the value
    * interval ([[graft.core.ValueCounts.statsInRange]]) — the partial
    * behind segment-native value-filtered SUM/MIN/MAX/AVG. The column
    * branch answers entirely-out segments from stored bounds without
    * touching the binary columns (the dominant case under selective
    * predicates); the kernel itself binary-searches a Swing segment's
    * in-range run and only evaluates that. `lower` None = no lower bound
    * (everything from the order's bottom, -Inf included); `upper` NaN =
    * unbounded above (NaN values included).
    */
  def statsInRangeCol(lower: Option[Double], upper: Double,
      tsLo: Long = Long.MinValue, tsHi: Long = Long.MaxValue): Column = {
    val kernel = ColumnBridge.column(SegmentStatsInRange(
      lower.getOrElse(Double.NegativeInfinity), lower.nonEmpty, upper,
      tsLo, tsHi,
      attr("model_type_id"), attr("start_time"), attr("end_time"),
      attr("timestamps"), attr("min_value"), attr("max_value"),
      attr("values"), attr("residuals")))
    val empty = struct(lit(0L).as("cnt"), lit(0.0).as("sum"),
      lit(null).cast("float").as("mn"), lit(null).cast("float").as("mx"),
      lit(null).cast("long").as("tmin"), lit(null).cast("long").as("tmax"),
      lit(0.0).as("m2"))
    val outBelow = lower
      .map(l =>
        if (upper.isNaN) col("max_value") <= l && !nanCapable
        else col("max_value") <= l)
      .getOrElse(lit(false))
    val outAbove =
      if (upper.isNaN) lit(false) else col("min_value") > upper
    when(outBelow || outAbove, empty).otherwise(kernel)
  }

  /** [[statsInRangeCol]] over a UNION of disjoint intervals — the
    * partial behind `WHERE v < a OR v > b`: a segment short-circuits to
    * the empty struct only when its stored bounds exclude EVERY
    * interval.
    */
  def statsInRangesCol(
      intervals: Seq[(Option[Double], Option[Double])],
      tsLo: Long = Long.MinValue, tsHi: Long = Long.MaxValue): Column = {
    require(intervals.nonEmpty, "statsInRangesCol needs intervals")
    val kernel = ColumnBridge.column(SegmentStatsInRanges(
      intervals.map(_._1.getOrElse(Double.NaN)),
      intervals.map(_._2.getOrElse(Double.NaN)), tsLo, tsHi,
      attr("model_type_id"), attr("start_time"), attr("end_time"),
      attr("timestamps"), attr("min_value"), attr("max_value"),
      attr("values"), attr("residuals")))
    val empty = struct(lit(0L).as("cnt"), lit(0.0).as("sum"),
      lit(null).cast("float").as("mn"), lit(null).cast("float").as("mx"),
      lit(null).cast("long").as("tmin"), lit(null).cast("long").as("tmax"),
      lit(0.0).as("m2"))
    val allOut = intervals.map { case (lo, up) =>
      val outBelow = lo
        .map(l =>
          if (up.isEmpty) col("max_value") <= l && !nanCapable
          else col("max_value") <= l)
        .getOrElse(lit(false))
      val outAbove = up.map(col("min_value") > _).getOrElse(lit(false))
      outBelow || outAbove
    }.reduce(_ && _)
    when(allOut, empty).otherwise(kernel)
  }

  /** [[statsInRangeCol]] with the TIMESTAMP window as COLUMNS — the
    * per-(segment, bucket) partial behind bucketed value-filtered stats.
    * The entirely-out short-circuit still comes from the stored value
    * bounds alone (the window clip can only shrink the in-range set).
    */
  def statsInRangeDynCol(lower: Option[Double], upper: Double,
      tsLoCol: Column, tsHiCol: Column): Column = {
    val kernel = ColumnBridge.column(SegmentStatsInRangeDyn(
      lower.getOrElse(Double.NegativeInfinity), lower.nonEmpty, upper,
      ColumnBridge.expression(tsLoCol), ColumnBridge.expression(tsHiCol),
      attr("model_type_id"), attr("start_time"), attr("end_time"),
      attr("timestamps"), attr("min_value"), attr("max_value"),
      attr("values"), attr("residuals")))
    val empty = struct(lit(0L).as("cnt"), lit(0.0).as("sum"),
      lit(null).cast("float").as("mn"), lit(null).cast("float").as("mx"),
      lit(null).cast("long").as("tmin"), lit(null).cast("long").as("tmax"),
      lit(0.0).as("m2"))
    val outBelow = lower
      .map(l =>
        if (upper.isNaN) col("max_value") <= l && !nanCapable
        else col("max_value") <= l)
      .getOrElse(lit(false))
    val outAbove =
      if (upper.isNaN) lit(false) else col("min_value") > upper
    when(outBelow || outAbove, empty).otherwise(kernel)
  }

  /** [[statsInRangeCol]] with PER-ROW bounds (columns of a
    * broadcast-joined per-group frame) — the partial behind segment-native
    * argmin/argmax and per-group filtered stats. NULL bounds mean
    * unbounded; `lowerInclusive` makes `lower = upper = target` select
    * exactly the points equal to `target` (NaN targets included). No
    * column-level short-circuit here: the kernel itself classifies
    * entirely-out segments from the scalar bounds before touching any
    * binary column, so the branch would only duplicate that test.
    */
  def statsBetweenCol(lowerInclusive: Boolean, lowerCol: Column,
      upperCol: Column, tsLo: Long = Long.MinValue,
      tsHi: Long = Long.MaxValue): Column =
    ColumnBridge.column(SegmentStatsBetween(
      lowerInclusive, ColumnBridge.expression(lowerCol),
      ColumnBridge.expression(upperCol), tsLo, tsHi,
      attr("model_type_id"), attr("start_time"), attr("end_time"),
      attr("timestamps"), attr("min_value"), attr("max_value"),
      attr("values"), attr("residuals")))

  /** Number of points with timestamp in [tsLo, tsHi] — values never decode. */
  def clippedLenCol(tsLo: Long, tsHi: Long): Column = ColumnBridge.column(
    SegmentClippedLen(tsLo, tsHi,
      attr("start_time"), attr("end_time"), attr("timestamps")))

  /** The f64 histogram bin floor((v - origin) / width) of a metadata value
    * column — MUST stay arithmetically identical to
    * [[graft.core.ValueCounts.histogram]]'s bin map (floor of a double
    * subtract-divide) so the metadata fast path and the kernel agree.
    */
  def binCol(c: Column, origin: Double, width: Double): Column =
    floor((c.cast("double") - lit(origin)) / lit(width))

  /** True when ALL of a segment's values provably fall in one histogram
    * bin, decided from metadata alone: finite non-NaN bounds in the same
    * bin, and no possibility of a hidden NaN. Such segments contribute
    * (bin, len) without decoding.
    */
  def singleBinCol(origin: Double, width: Double): Column =
    !nanCapable &&
      !isnan(col("min_value")) && !isnan(col("max_value")) &&
      col("min_value") =!= lit(Float.NegativeInfinity) &&
      col("max_value") =!= lit(Float.PositiveInfinity) &&
      binCol(col("min_value"), origin, width) ===
        binCol(col("max_value"), origin, width)

  /** The Chan-merged centered second moment of (count, Σv, m2) partial
    * columns — one aggregate column merging per-segment moments into the
    * group's M2 = Σ(v − μ_group)², numerically stable at any mean (raw
    * Σv² − (Σv)²/n cancels catastrophically for large-mean/low-variance
    * series). NULL/zero-count partials are skipped inside the aggregate,
    * so `when(cond, partial)` field gating works unchanged.
    */
  def m2MergeCol(cnt: Column, s: Column, m2: Column): Column =
    ColumnBridge.column(PartialM2Merge(
      ColumnBridge.expression(cnt), ColumnBridge.expression(s),
      ColumnBridge.expression(m2)).toAggregateExpression())

  /** Variance from a group's (count, merged M2) — NULL below the minimum
    * count, mirroring SQL var_samp (n >= 2) / var_pop (n >= 1); the
    * greatest(0, ·) guard only absorbs epsilon-negative merge residue
    * (M2 is a sum of squares up to rounding), never a cancelled moment.
    */
  def varianceFromM2(cnt: Column, m2: Column, sample: Boolean): Column = {
    val n = cnt.cast("double")
    val divisor = if (sample) n - 1d else n
    when(cnt > (if (sample) 1L else 0L), greatest(lit(0d), m2 / divisor))
      .otherwise(lit(null).cast("double"))
  }

  /** The aggregate column for one kind ("count" | "min" | "max" | "sum" |
    * "avg") over one field's segments within a mixed-field frame — the
    * single source of truth shared by the facade and the Catalyst rewrite.
    */
  def aggColumnFor(kind: String, fieldIndex: Int): Column = {
    val onField = (c: Column) =>
      when(col(SegmentSchema.FieldColumn) === fieldIndex, c)
    // The var/stddev kinds share one SegmentSumStats decode: the sum and
    // m2 extracts reference the SAME struct subtree, which Spark's
    // aggregate-level subexpression elimination evaluates once; the
    // per-segment moments merge with Chan's update (PartialM2Merge).
    def cnt = sum(onField(lenCol))
    def statsM2 = m2MergeCol(onField(lenCol),
      onField(sumStatsCol.getField("sum")),
      onField(sumStatsCol.getField("m2")))
    kind match {
      case "count" => coalesce(sum(onField(lenCol)), lit(0L))
      case "min" => org.apache.spark.sql.functions.min(onField(col("min_value")))
      case "max" => org.apache.spark.sql.functions.max(onField(col("max_value")))
      case "sum" => sum(onField(sumCol))
      case "avg" => sum(onField(sumCol)) / sum(onField(lenCol))
      case "var_samp" => varianceFromM2(cnt, statsM2, sample = true)
      case "var_pop" => varianceFromM2(cnt, statsM2, sample = false)
      case "stddev_samp" =>
        sqrt(varianceFromM2(cnt, statsM2, sample = true))
      case "stddev_pop" =>
        sqrt(varianceFromM2(cnt, statsM2, sample = false))
      // FIRST/LAST by time: the group winner is the segment with the
      // extreme time bound; its edge value is that extreme's point
      // (segments of one series never overlap, so the bound is unique
      // per series; cross-series ties pick either value, matching
      // Spark's own min_by/max_by tie semantics).
      case "first" =>
        min_by(onField(edgeValuesCol.getField("first")),
          onField(col("start_time")))
      case "last" =>
        max_by(onField(edgeValuesCol.getField("last")),
          onField(col("end_time")))
      case other => throw new IllegalArgumentException(s"Unknown aggregate $other.")
    }
  }

  /** `SELECT count(field) FROM t` on segments of one field column. */
  def count(segments: DataFrame, fieldIndex: Int): DataFrame =
    perField(segments, fieldIndex).agg(coalesce(sum(lenCol), lit(0L)).as("count"))

  def min(segments: DataFrame, fieldIndex: Int): DataFrame =
    perField(segments, fieldIndex)
      .agg(org.apache.spark.sql.functions.min("min_value").as("min"))

  def max(segments: DataFrame, fieldIndex: Int): DataFrame =
    perField(segments, fieldIndex)
      .agg(org.apache.spark.sql.functions.max("max_value").as("max"))

  def sumOf(segments: DataFrame, fieldIndex: Int): DataFrame =
    perField(segments, fieldIndex).agg(sum(sumCol).as("sum"))

  def avg(segments: DataFrame, fieldIndex: Int): DataFrame =
    perField(segments, fieldIndex)
      .agg((sum(sumCol) / sum(lenCol)).as("avg"))

  private def perField(segments: DataFrame, fieldIndex: Int): DataFrame =
    segments.where(col(SegmentSchema.FieldColumn) === fieldIndex)
}
