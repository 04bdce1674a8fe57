package graft.tsdb

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

import graft.core.{Models, TimestampCodec}

/** Number of data points a segment represents, decoded from the timestamp
  * metadata alone — the kernel behind segment-native COUNT/AVG
  * (/root/reference/crates/modelardb_compression/src/models/mod.rs:98-124).
  * Native expression form: no ScalaUDF converter pass per segment row.
  */
case class SegmentLen(
    startTime: Expression, endTime: Expression, timestamps: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(startTime, endTime, timestamps)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    TimestampCodec.len(
      startTime.eval(input).asInstanceOf[Long],
      endTime.eval(input).asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]]).toLong
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2))
}

/** Sum of a segment's values from the model's closed form (PMC len*value,
  * Swing trapezoid, MacaqueV decode-sum, + residuals), f64-accumulated —
  * the kernel behind segment-native SUM/AVG
  * (/root/reference/crates/modelardb_compression/src/models/mod.rs:129-184).
  */
case class SegmentSum(
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression with CodegenFallback {

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

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3),
      newChildren(4), newChildren(5), newChildren(6), newChildren(7))
}
