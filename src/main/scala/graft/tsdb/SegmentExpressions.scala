package graft.tsdb

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

import graft.core.{Models, TimestampCodec}

/** Number of data points a segment represents, decoded from the timestamp
  * metadata alone — the kernel behind segment-native COUNT/AVG
  * (/root/reference/crates/modelardb_compression/src/models/mod.rs:98-124).
  * Native expression with codegen: the surrounding Project/HashAggregate
  * stays in one whole-stage span, no interpreted-expression call boundary.
  * Children come from the non-null segment schema, hence no null branches
  * (matching the interpreted eval, which would throw on null anyway).
  */
case class SegmentLen(
    startTime: Expression, endTime: Expression, timestamps: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(startTime, endTime, timestamps)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    TimestampCodec.len(
      startTime.eval(input).asInstanceOf[Long],
      endTime.eval(input).asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]]).toLong
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |long ${ev.value} = (long) graft.core.TimestampCodec.len(
           |  ${evals(0).value}, ${evals(1).value}, ${evals(2).value});
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2))
}

/** Sum of a segment's values from the model's closed form (PMC len*value,
  * Swing trapezoid, MacaqueV decode-sum, + residuals), f64-accumulated —
  * the kernel behind segment-native SUM/AVG
  * (/root/reference/crates/modelardb_compression/src/models/mod.rs:129-184).
  * Codegen'd like [[SegmentLen]].
  */
case class SegmentSum(
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    Models.sumDouble(
      modelTypeId.eval(input).asInstanceOf[Byte],
      startTime.eval(input).asInstanceOf[Long],
      endTime.eval(input).asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]],
      minValue.eval(input).asInstanceOf[Float],
      maxValue.eval(input).asInstanceOf[Float],
      values.eval(input).asInstanceOf[Array[Byte]],
      residuals.eval(input).asInstanceOf[Array[Byte]])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |double ${ev.value} = graft.core.Models.sumDouble(
           |  ${evals.map(_.value).mkString(", ")});
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3),
      newChildren(4), newChildren(5), newChildren(6), newChildren(7))
}

/** Static kernel wrapper producing the (sum, m2) struct row — callable
  * from generated code, shared with interpreted eval.
  */
object SegmentKernels {
  def sumStatsRow(modelTypeId: Byte, startTime: Long, endTime: Long,
      timestamps: Array[Byte], minValue: Float, maxValue: Float,
      values: Array[Byte], residuals: Array[Byte]): InternalRow = {
    val a = Models.sumStats(modelTypeId, startTime, endTime, timestamps,
      minValue, maxValue, values, residuals)
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    r.setDouble(0, a(0))
    r.setDouble(1, a(1))
    r
  }

  def edgeValuesRow(modelTypeId: Byte, startTime: Long, endTime: Long,
      timestamps: Array[Byte], minValue: Float, maxValue: Float,
      values: Array[Byte], residuals: Array[Byte]): InternalRow = {
    val a = Models.edgeValues(modelTypeId, startTime, endTime, timestamps,
      minValue, maxValue, values, residuals)
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    r.setFloat(0, a(0))
    r.setFloat(1, a(1))
    r
  }

  def timeGapRow(startTime: Long, endTime: Long, timestamps: Array[Byte],
      thresholdUs: Long): InternalRow = {
    val a = TimestampCodec.timeGapStats(startTime, endTime, timestamps,
      thresholdUs)
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    if (a(0) < 0L) r.update(0, null) else r.setLong(0, a(0))
    r.setLong(1, a(1))
    r
  }

  /** Fold an optionally-INCLUSIVE lower bound into statsInRange's
    * exclusive form: nextDown for finite bounds (exact — no double lies
    * between), unbounded for -Inf, +Inf for NaN (only NaN sits above).
    * Shared by [[SegmentStatsBetween]]'s interpreted and generated paths.
    */
  def effectiveLower(isNull: Boolean, lv: Double,
      inclusive: Boolean): (Double, Boolean) = {
    if (isNull) (0.0, false)
    else if (!inclusive) (lv, true)
    else if (java.lang.Double.isNaN(lv)) (Double.PositiveInfinity, true)
    else if (lv == Double.NegativeInfinity) (0.0, false)
    else (Math.nextDown(lv), true)
  }

  def statsInRangeRow(lower: Double, hasLower: Boolean, upper: Double,
      tsLo: Long, tsHi: Long, modelTypeId: Byte, startTime: Long,
      endTime: Long, timestamps: Array[Byte], minValue: Float,
      maxValue: Float, values: Array[Byte],
      residuals: Array[Byte]): InternalRow =
    statsInRangesRow(Array(if (hasLower) lower else Double.NaN),
      Array(upper), tsLo, tsHi, modelTypeId, startTime, endTime, timestamps,
      minValue, maxValue, values, residuals)

  def statsInRangesRow(los: Array[Double], his: Array[Double],
      tsLo: Long, tsHi: Long, modelTypeId: Byte, startTime: Long,
      endTime: Long, timestamps: Array[Byte], minValue: Float,
      maxValue: Float, values: Array[Byte],
      residuals: Array[Byte]): InternalRow = {
    val a = graft.core.ValueCounts.statsInRanges(los, his,
      tsLo, tsHi, modelTypeId, startTime, endTime, timestamps, minValue,
      maxValue, values, residuals)
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(7)
    val cnt = a(0).toLong
    r.setLong(0, cnt)
    r.setDouble(1, a(1))
    if (cnt == 0L) {
      r.update(2, null); r.update(3, null); r.update(4, null); r.update(5, null)
    } else {
      r.setFloat(2, a(2).toFloat); r.setFloat(3, a(3).toFloat)
      r.setLong(4, a(4).toLong); r.setLong(5, a(5).toLong)
    }
    r.setDouble(6, a(6))
    r
  }
}

/** (Σv, m2 = Σ(v − mean_seg)²) of a segment's values as one struct — a
  * SINGLE decode pass answers both partials, so variance closed forms
  * don't pay a second reconstruction next to [[SegmentSum]]. Codegen'd like [[SegmentLen]];
  * consumers extract the fields in a CHAINED projection so CollapseProject
  * never inlines (and re-decodes) the kernel per extracted field.
  */
case class SegmentSumStats(
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)
  override def dataType: DataType = StructType(Seq(
    StructField("sum", DoubleType, nullable = false),
    StructField("m2", DoubleType, nullable = false)))
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    SegmentKernels.sumStatsRow(
      modelTypeId.eval(input).asInstanceOf[Byte],
      startTime.eval(input).asInstanceOf[Long],
      endTime.eval(input).asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]],
      minValue.eval(input).asInstanceOf[Float],
      maxValue.eval(input).asInstanceOf[Float],
      values.eval(input).asInstanceOf[Array[Byte]],
      residuals.eval(input).asInstanceOf[Array[Byte]])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val rowCls = classOf[InternalRow].getName
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |$rowCls ${ev.value} = graft.tsdb.SegmentKernels.sumStatsRow(
           |  ${evals.map(_.value).mkString(", ")});
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3),
      newChildren(4), newChildren(5), newChildren(6), newChildren(7))
}

/** A segment's chronologically (first, last) values as one struct — the
  * kernel behind segment-native `min_by(value, ts)` / `max_by(value, ts)`
  * (FIRST/LAST by time): the group winner is the segment with the extreme
  * time bound, and its edge value is that extreme's point. Codegen'd like
  * [[SegmentSumStats]], extracted in chained projections.
  */
case class SegmentEdgeValues(
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)
  override def dataType: DataType = StructType(Seq(
    StructField("first", FloatType, nullable = false),
    StructField("last", FloatType, nullable = false)))
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    SegmentKernels.edgeValuesRow(
      modelTypeId.eval(input).asInstanceOf[Byte],
      startTime.eval(input).asInstanceOf[Long],
      endTime.eval(input).asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]],
      minValue.eval(input).asInstanceOf[Float],
      maxValue.eval(input).asInstanceOf[Float],
      values.eval(input).asInstanceOf[Array[Byte]],
      residuals.eval(input).asInstanceOf[Array[Byte]])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val rowCls = classOf[InternalRow].getName
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |$rowCls ${ev.value} = graft.tsdb.SegmentKernels.edgeValuesRow(
           |  ${evals.map(_.value).mkString(", ")});
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3),
      newChildren(4), newChildren(5), newChildren(6), newChildren(7))
}

/** (max consecutive timestamp delta, count of deltas > threshold) of one
  * segment as a struct — the intra-segment half of gap detection
  * ([[graft.core.TimestampCodec.timeGapStats]]): values never decode, and
  * regular segments answer in O(1) from the stored length. `max_delta` is
  * NULL for single-point segments (no deltas). Codegen'd like
  * [[SegmentLen]].
  */
case class SegmentTimeGaps(
    thresholdUs: Long,
    startTime: Expression, endTime: Expression, timestamps: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(startTime, endTime, timestamps)
  override def dataType: DataType = StructType(Seq(
    StructField("max_delta", LongType, nullable = true),
    StructField("n_over", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    SegmentKernels.timeGapRow(
      startTime.eval(input).asInstanceOf[Long],
      endTime.eval(input).asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]],
      thresholdUs)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val rowCls = classOf[InternalRow].getName
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |$rowCls ${ev.value} = graft.tsdb.SegmentKernels.timeGapRow(
           |  ${evals.map(_.value).mkString(", ")}, ${thresholdUs}L);
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(thresholdUs, newChildren(0), newChildren(1), newChildren(2))
}

/** Count of a segment's reconstructed values in (lower, upper] at
  * timestamps within [tsLo, tsHi] — the kernel behind segment-native
  * value-predicate COUNT ([[graft.core.ValueCounts.countInRange]]): PMC
  * closed form, Swing O(log len) monotone binary search, values-only walk
  * for MacaqueV. Codegen'd like [[SegmentLen]]; the double bounds embed as
  * raw bits so ±Infinity and exactness survive Java source text.
  */
case class SegmentCountInRange(
    lower: Double, upper: Double, tsLo: Long, tsHi: Long,
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    graft.core.ValueCounts.countInRange(lower, upper, tsLo, tsHi,
      modelTypeId.eval(input).asInstanceOf[Byte],
      startTime.eval(input).asInstanceOf[Long],
      endTime.eval(input).asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]],
      minValue.eval(input).asInstanceOf[Float],
      maxValue.eval(input).asInstanceOf[Float],
      values.eval(input).asInstanceOf[Array[Byte]],
      residuals.eval(input).asInstanceOf[Array[Byte]])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val lowerBits = java.lang.Double.doubleToRawLongBits(lower)
    val upperBits = java.lang.Double.doubleToRawLongBits(upper)
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |long ${ev.value} = graft.core.ValueCounts.countInRange(
           |  java.lang.Double.longBitsToDouble(${lowerBits}L),
           |  java.lang.Double.longBitsToDouble(${upperBits}L),
           |  ${tsLo}L, ${tsHi}L, ${evals.map(_.value).mkString(", ")});
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lower, upper, tsLo, tsHi, newChildren(0), newChildren(1),
      newChildren(2), newChildren(3), newChildren(4), newChildren(5),
      newChildren(6), newChildren(7))
}

/** (count, Σv, min, max) of a segment's reconstructed values inside a
  * value interval ([[graft.core.ValueCounts.statsInRange]]) — the kernel
  * behind segment-native value-filtered SUM/MIN/MAX/AVG: lower exclusive
  * (inactive when `hasLower` is false), upper inclusive with the NaN
  * "unbounded" sentinel, timestamps clipped to [tsLo, tsHi]. min/max are
  * NULL when no value qualifies. Codegen'd like [[SegmentSumStats]];
  * consumers extract fields of the SAME struct subtree so aggregate-level
  * subexpression elimination evaluates the kernel once per segment.
  */
case class SegmentStatsInRange(
    lower: Double, hasLower: Boolean, upper: Double, tsLo: Long, tsHi: Long,
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)
  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("sum", DoubleType, nullable = false),
    StructField("mn", FloatType, nullable = true),
    StructField("mx", FloatType, nullable = true),
    StructField("tmin", LongType, nullable = true),
    StructField("tmax", LongType, nullable = true),
    StructField("m2", DoubleType, nullable = false)))
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    SegmentKernels.statsInRangeRow(lower, hasLower, upper, tsLo, tsHi,
      modelTypeId.eval(input).asInstanceOf[Byte],
      startTime.eval(input).asInstanceOf[Long],
      endTime.eval(input).asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]],
      minValue.eval(input).asInstanceOf[Float],
      maxValue.eval(input).asInstanceOf[Float],
      values.eval(input).asInstanceOf[Array[Byte]],
      residuals.eval(input).asInstanceOf[Array[Byte]])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val lowerBits = java.lang.Double.doubleToRawLongBits(lower)
    val upperBits = java.lang.Double.doubleToRawLongBits(upper)
    val rowCls = classOf[InternalRow].getName
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |$rowCls ${ev.value} = graft.tsdb.SegmentKernels.statsInRangeRow(
           |  java.lang.Double.longBitsToDouble(${lowerBits}L), $hasLower,
           |  java.lang.Double.longBitsToDouble(${upperBits}L),
           |  ${tsLo}L, ${tsHi}L, ${evals.map(_.value).mkString(", ")});
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lower, hasLower, upper, tsLo, tsHi, newChildren(0), newChildren(1),
      newChildren(2), newChildren(3), newChildren(4), newChildren(5),
      newChildren(6), newChildren(7))
}

/** [[SegmentStatsInRange]] over a UNION of disjoint value intervals —
  * the kernel behind `WHERE v < a OR v > b` (the outlier band): the
  * merged, ascending interval list rides along as a codegen reference
  * object and one traversal accumulates the union's stats. `los(i)` NaN
  * = that interval is unbounded below; `his(i)` NaN = unbounded above.
  */
case class SegmentStatsInRanges(
    los: Seq[Double], his: Seq[Double], tsLo: Long, tsHi: Long,
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)
  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("sum", DoubleType, nullable = false),
    StructField("mn", FloatType, nullable = true),
    StructField("mx", FloatType, nullable = true),
    StructField("tmin", LongType, nullable = true),
    StructField("tmax", LongType, nullable = true),
    StructField("m2", DoubleType, nullable = false)))
  override def nullable: Boolean = false

  @transient private lazy val losArr: Array[Double] = los.toArray
  @transient private lazy val hisArr: Array[Double] = his.toArray

  override def eval(input: InternalRow): Any = {
    SegmentKernels.statsInRangesRow(losArr, hisArr, tsLo, tsHi,
      modelTypeId.eval(input).asInstanceOf[Byte],
      startTime.eval(input).asInstanceOf[Long],
      endTime.eval(input).asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]],
      minValue.eval(input).asInstanceOf[Float],
      maxValue.eval(input).asInstanceOf[Float],
      values.eval(input).asInstanceOf[Array[Byte]],
      residuals.eval(input).asInstanceOf[Array[Byte]])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val losRef = ctx.addReferenceObj("los", losArr, "double[]")
    val hisRef = ctx.addReferenceObj("his", hisArr, "double[]")
    val rowCls = classOf[InternalRow].getName
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |$rowCls ${ev.value} = graft.tsdb.SegmentKernels.statsInRangesRow(
           |  $losRef, $hisRef, ${tsLo}L, ${tsHi}L,
           |  ${evals.map(_.value).mkString(", ")});
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(los, his, tsLo, tsHi, newChildren(0), newChildren(1),
      newChildren(2), newChildren(3), newChildren(4), newChildren(5),
      newChildren(6), newChildren(7))
}

/** [[SegmentStatsInRange]] with the TIMESTAMP window as EXPRESSIONS —
  * the kernel behind per-bucket value-filtered stats: a bucket-straddling
  * segment explodes into its overlapped buckets and each (segment,
  * bucket) row evaluates this kernel against that bucket's window. The
  * value bounds stay literals (one predicate per query); the window clip
  * is O(1) index arithmetic for regular segments.
  */
case class SegmentStatsInRangeDyn(
    lower: Double, hasLower: Boolean, upper: Double,
    tsLo: Expression, tsHi: Expression,
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(tsLo, tsHi,
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)
  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("sum", DoubleType, nullable = false),
    StructField("mn", FloatType, nullable = true),
    StructField("mx", FloatType, nullable = true),
    StructField("tmin", LongType, nullable = true),
    StructField("tmax", LongType, nullable = true),
    StructField("m2", DoubleType, nullable = false)))
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    SegmentKernels.statsInRangeRow(lower, hasLower, upper,
      tsLo.eval(input).asInstanceOf[Long],
      tsHi.eval(input).asInstanceOf[Long],
      modelTypeId.eval(input).asInstanceOf[Byte],
      startTime.eval(input).asInstanceOf[Long],
      endTime.eval(input).asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]],
      minValue.eval(input).asInstanceOf[Float],
      maxValue.eval(input).asInstanceOf[Float],
      values.eval(input).asInstanceOf[Array[Byte]],
      residuals.eval(input).asInstanceOf[Array[Byte]])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val lowerBits = java.lang.Double.doubleToRawLongBits(lower)
    val upperBits = java.lang.Double.doubleToRawLongBits(upper)
    val rowCls = classOf[InternalRow].getName
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |$rowCls ${ev.value} = graft.tsdb.SegmentKernels.statsInRangeRow(
           |  java.lang.Double.longBitsToDouble(${lowerBits}L), $hasLower,
           |  java.lang.Double.longBitsToDouble(${upperBits}L),
           |  ${evals(0).value}, ${evals(1).value},
           |  ${evals.drop(2).map(_.value).mkString(", ")});
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lower, hasLower, upper, newChildren(0), newChildren(1),
      newChildren(2), newChildren(3), newChildren(4), newChildren(5),
      newChildren(6), newChildren(7), newChildren(8), newChildren(9))
}

/** [[SegmentStatsInRange]] with the value bounds as EXPRESSIONS (columns
  * of a broadcast-joined per-group frame) — the kernel behind
  * segment-native argmin/argmax (per-group target values) and per-group
  * filtered stats. NULL lower = unbounded below, NULL upper = unbounded
  * above (NaN sentinel, NaN values included). With `lowerInclusive` the
  * lower bound itself qualifies: the kernel folds that into the exclusive
  * form exactly — nextDown for finite bounds (no double lies between),
  * "unbounded" for -Inf (nothing below it), +Inf for a NaN bound (only
  * NaN sits above +Inf) — so `lower = upper = target, lowerInclusive`
  * selects exactly the points equal to `target`, NaN targets included.
  */
case class SegmentStatsBetween(
    lowerInclusive: Boolean, lower: Expression, upper: Expression,
    tsLo: Long, tsHi: Long,
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(lower, upper,
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)
  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("sum", DoubleType, nullable = false),
    StructField("mn", FloatType, nullable = true),
    StructField("mx", FloatType, nullable = true),
    StructField("tmin", LongType, nullable = true),
    StructField("tmax", LongType, nullable = true),
    StructField("m2", DoubleType, nullable = false)))
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val lv = lower.eval(input)
    val (lo, hasLower) = SegmentKernels.effectiveLower(
      lv == null, if (lv == null) 0.0 else lv.asInstanceOf[Double],
      lowerInclusive)
    val uv = upper.eval(input)
    val hi = if (uv == null) Double.NaN else uv.asInstanceOf[Double]
    SegmentKernels.statsInRangeRow(lo, hasLower, hi, tsLo, tsHi,
      modelTypeId.eval(input).asInstanceOf[Byte],
      startTime.eval(input).asInstanceOf[Long],
      endTime.eval(input).asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]],
      minValue.eval(input).asInstanceOf[Float],
      maxValue.eval(input).asInstanceOf[Float],
      values.eval(input).asInstanceOf[Array[Byte]],
      residuals.eval(input).asInstanceOf[Array[Byte]])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val rowCls = classOf[InternalRow].getName
    val loVal = ctx.freshName("loBound")
    val hasLo = ctx.freshName("hasLower")
    val hiVal = ctx.freshName("hiBound")
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |boolean $hasLo = !${evals(0).isNull};
           |double $loVal = $hasLo ? ${evals(0).value} : 0.0;
           |if ($hasLo && $lowerInclusive) {
           |  if (Double.isNaN($loVal)) $loVal = Double.POSITIVE_INFINITY;
           |  else if ($loVal == Double.NEGATIVE_INFINITY) $hasLo = false;
           |  else $loVal = Math.nextDown($loVal);
           |}
           |double $hiVal = ${evals(1).isNull} ? Double.NaN : ${evals(1).value};
           |$rowCls ${ev.value} = graft.tsdb.SegmentKernels.statsInRangeRow(
           |  $loVal, $hasLo, $hiVal, ${tsLo}L, ${tsHi}L,
           |  ${evals.drop(2).map(_.value).mkString(", ")});
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lowerInclusive, newChildren(0), newChildren(1), tsLo, tsHi,
      newChildren(2), newChildren(3), newChildren(4), newChildren(5),
      newChildren(6), newChildren(7), newChildren(8), newChildren(9))
}

/** Number of a segment's points with timestamp in [tsLo, tsHi] — the
  * range-clipped [[SegmentLen]] ([[graft.core.ValueCounts.clippedLen]]):
  * values never decode, regular segments answer in O(1). The boundary-side
  * total for ranged predicate counts.
  */
case class SegmentClippedLen(
    tsLo: Long, tsHi: Long,
    startTime: Expression, endTime: Expression, timestamps: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(startTime, endTime, timestamps)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    graft.core.ValueCounts.clippedLen(tsLo, tsHi,
      startTime.eval(input).asInstanceOf[Long],
      endTime.eval(input).asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |long ${ev.value} = graft.core.ValueCounts.clippedLen(
           |  ${tsLo}L, ${tsHi}L, ${evals.map(_.value).mkString(", ")});
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tsLo, tsHi, newChildren(0), newChildren(1), newChildren(2))
}

/** Per-threshold `count(v > x)` array of one segment — MANY thresholds
  * from ONE shared traversal ([[graft.core.ValueCounts.countAboveMulti]]),
  * the probe behind the exact-quantile bisection ladder: consumers extract
  * the elements in a CHAINED projection (like [[SegmentSumStats]]) so the
  * kernel evaluates once per segment however many thresholds a round
  * probes. The thresholds ride along as a codegen reference object.
  */
case class SegmentCountAboveMulti(
    lowers: Seq[Double], tsLo: Long, tsHi: Long,
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val xs: Array[Double] = lowers.toArray

  override def eval(input: InternalRow): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.core.ValueCounts.countAboveMulti(xs, tsLo, tsHi,
        modelTypeId.eval(input).asInstanceOf[Byte],
        startTime.eval(input).asInstanceOf[Long],
        endTime.eval(input).asInstanceOf[Long],
        timestamps.eval(input).asInstanceOf[Array[Byte]],
        minValue.eval(input).asInstanceOf[Float],
        maxValue.eval(input).asInstanceOf[Float],
        values.eval(input).asInstanceOf[Array[Byte]],
        residuals.eval(input).asInstanceOf[Array[Byte]]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val xsRef = ctx.addReferenceObj("lowers", xs, "double[]")
    val arrCls = classOf[org.apache.spark.sql.catalyst.util.ArrayData].getName
    val genCls = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |$arrCls ${ev.value} = new $genCls(
           |  graft.core.ValueCounts.countAboveMulti($xsRef, ${tsLo}L,
           |  ${tsHi}L, ${evals.map(_.value).mkString(", ")}));
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lowers, tsLo, tsHi, newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4), newChildren(5), newChildren(6),
      newChildren(7))
}

/** One segment's regression partials (n, Σt', Σt'², Σv, Σv², Σv·t'),
  * t' = t − t0, range-clipped ([[graft.core.Regression.sums]]) — the
  * kernel behind per-series least-squares trend and value↔time
  * correlation: one decode pass per segment, no point stream. Consumers
  * extract elements in a CHAINED projection (like [[SegmentSumStats]]).
  */
case class SegmentRegressionSums(
    t0: Long, tsLo: Long, tsHi: Long,
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.core.Regression.sums(t0, tsLo, tsHi,
        modelTypeId.eval(input).asInstanceOf[Byte],
        startTime.eval(input).asInstanceOf[Long],
        endTime.eval(input).asInstanceOf[Long],
        timestamps.eval(input).asInstanceOf[Array[Byte]],
        minValue.eval(input).asInstanceOf[Float],
        maxValue.eval(input).asInstanceOf[Float],
        values.eval(input).asInstanceOf[Array[Byte]],
        residuals.eval(input).asInstanceOf[Array[Byte]]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arrCls = classOf[org.apache.spark.sql.catalyst.util.ArrayData].getName
    val genCls = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |$arrCls ${ev.value} = new $genCls(
           |  graft.core.Regression.sums(${t0}L, ${tsLo}L, ${tsHi}L,
           |  ${evals.map(_.value).mkString(", ")}));
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(t0, tsLo, tsHi, newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4), newChildren(5), newChildren(6),
      newChildren(7))
}

/** [[SegmentCountInRange]] with the value bounds as EXPRESSIONS instead of
  * literals — the kernel behind per-group dynamic thresholds (outlier
  * screens counting beyond each series' own μ ± k·σ): bounds arrive as
  * columns of a broadcast-joined statistics frame, so no driver-side
  * collect of per-group bounds ever happens. NULL bounds mean unbounded
  * below / above (above = the NaN sentinel, including NaN values).
  */
case class SegmentCountBetween(
    lower: Expression, upper: Expression, tsLo: Long, tsHi: Long,
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(lower, upper,
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private def boundOf(e: Expression, input: InternalRow, lo: Boolean): Double = {
    val v = e.eval(input)
    if (v == null) { if (lo) Double.NegativeInfinity else Double.NaN }
    else v.asInstanceOf[Double]
  }

  override def eval(input: InternalRow): Any = {
    graft.core.ValueCounts.countInRange(
      boundOf(lower, input, lo = true), boundOf(upper, input, lo = false),
      tsLo, tsHi,
      modelTypeId.eval(input).asInstanceOf[Byte],
      startTime.eval(input).asInstanceOf[Long],
      endTime.eval(input).asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]],
      minValue.eval(input).asInstanceOf[Float],
      maxValue.eval(input).asInstanceOf[Float],
      values.eval(input).asInstanceOf[Array[Byte]],
      residuals.eval(input).asInstanceOf[Array[Byte]])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val loVal = ctx.freshName("lowerBound")
    val hiVal = ctx.freshName("upperBound")
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |double $loVal = ${evals(0).isNull} ?
           |  Double.NEGATIVE_INFINITY : ${evals(0).value};
           |double $hiVal = ${evals(1).isNull} ? Double.NaN : ${evals(1).value};
           |long ${ev.value} = graft.core.ValueCounts.countInRange(
           |  $loVal, $hiVal, ${tsLo}L, ${tsHi}L,
           |  ${evals.drop(2).map(_.value).mkString(", ")});
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), tsLo, tsHi, newChildren(2),
      newChildren(3), newChildren(4), newChildren(5), newChildren(6),
      newChildren(7), newChildren(8), newChildren(9))
}

/** [[SegmentCountAboveMulti]] with PER-ROW thresholds: the probe array is
  * a child expression (array<double>, broadcast-joined onto the segment
  * relation by tag group), so one job can answer DIFFERENT thresholds for
  * different series — the probe behind the per-group exact-quantile
  * ladder, where each group bisects its own interval.
  */
case class SegmentCountAboveMultiDyn(
    tsLo: Long, tsHi: Long, lowers: Expression,
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(
    lowers, modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.core.ValueCounts.countAboveMulti(
        lowers.eval(input)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray(),
        tsLo, tsHi,
        modelTypeId.eval(input).asInstanceOf[Byte],
        startTime.eval(input).asInstanceOf[Long],
        endTime.eval(input).asInstanceOf[Long],
        timestamps.eval(input).asInstanceOf[Array[Byte]],
        minValue.eval(input).asInstanceOf[Float],
        maxValue.eval(input).asInstanceOf[Float],
        values.eval(input).asInstanceOf[Array[Byte]],
        residuals.eval(input).asInstanceOf[Array[Byte]]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arrCls = classOf[org.apache.spark.sql.catalyst.util.ArrayData].getName
    val genCls = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |$arrCls ${ev.value} = new $genCls(
           |  graft.core.ValueCounts.countAboveMulti(
           |  ((${arrCls}) ${evals.head.value}).toDoubleArray(), ${tsLo}L,
           |  ${tsHi}L, ${evals.tail.map(_.value).mkString(", ")}));
           """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tsLo, tsHi, newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4), newChildren(5), newChildren(6),
      newChildren(7), newChildren(8))
}

/** Distinct in-interval values with multiplicities of one segment —
  * (lower, upper] under the SQL total order, as array<struct<v,c>>
  * ([[graft.core.ValueCounts.valuesInRange]]): the kernel behind the
  * federated rank search's bounded FETCH when the probe target is
  * segment-native. Bounds arrive as expressions (per-state intervals of
  * a broadcast-joined probe frame). Interpreted eval (CodegenFallback):
  * the fetch runs once per rank-search statement over the boundary
  * segments only — never in a per-round or per-point hot path.
  */
case class SegmentValuesInRange(
    lower: Expression, upper: Expression, tsLo: Long, tsHi: Long,
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(lower, upper,
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val pairs = graft.core.ValueCounts.valuesInRange(
      lower.eval(input).asInstanceOf[Double],
      upper.eval(input).asInstanceOf[Double],
      tsLo, tsHi,
      modelTypeId.eval(input).asInstanceOf[Byte],
      startTime.eval(input).asInstanceOf[Long],
      endTime.eval(input).asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]],
      minValue.eval(input).asInstanceOf[Float],
      maxValue.eval(input).asInstanceOf[Float],
      values.eval(input).asInstanceOf[Array[Byte]],
      residuals.eval(input).asInstanceOf[Array[Byte]])
    val rows = new Array[Any](pairs.length / 2)
    var i = 0
    while (i < rows.length) {
      rows(i) = InternalRow(pairs(2 * i), pairs(2 * i + 1).toLong)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), tsLo, tsHi, newChildren(2),
      newChildren(3), newChildren(4), newChildren(5), newChildren(6),
      newChildren(7), newChildren(8), newChildren(9))
}

/** [[graft.core.ValueCounts.totalOrderKey]] as a codegen'd expression —
  * a float's position in the SQL total order's 32-bit keyspace, used by
  * the distributed exact-rank ladder to derive probe points inside the
  * plan (no driver round-trip).
  */
case class FloatTotalOrderKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    graft.core.ValueCounts.totalOrderKey(v.asInstanceOf[Float])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.core.ValueCounts.totalOrderKey($c)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(newChild)
}

/** Inverse of [[FloatTotalOrderKey]] ([[graft.core.ValueCounts.floatFromKey]]). */
case class FloatFromOrderKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = FloatType
  override protected def nullSafeEval(v: Any): Any =
    graft.core.ValueCounts.floatFromKey(v.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.core.ValueCounts.floatFromKey($c)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(newChild)
}
