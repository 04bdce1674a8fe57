package graft.tsdb

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

import graft.core.{FloatBuf, LongBuf, Models}

/** Native Catalyst generator reconstructing a segment's data points — the
  * expression-level form of the reference's GridExec
  * (/root/reference/crates/modelardb_storage/src/query/grid_exec.rs:56-437).
  *
  * Compared to the earlier `explode(udf(...))` formulation this emits
  * (timestamp, value) rows straight from the decode buffers: no per-point
  * Tuple2 allocation, no CatalystTypeConverters pass over a materialized
  * array, and no follow-up struct-field projection. The generator itself is
  * CodegenFallback (one virtual call per segment, amortized over its
  * points); the surrounding Generate/Project/Filter pipeline stays in
  * whole-stage codegen.
  */
case class GridPoints(
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)

  override def elementSchema: StructType = StructType(Seq(
    StructField("__graft_ts", LongType, nullable = false),
    StructField("__graft_value", FloatType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val mt = modelTypeId.eval(input)
    val st = startTime.eval(input)
    val et = endTime.eval(input)
    val mn = minValue.eval(input)
    val mx = maxValue.eval(input)
    if (mt == null || st == null || et == null || mn == null || mx == null) {
      return Iterator.empty
    }
    val tsBuf = new LongBuf(128)
    val vBuf = new FloatBuf(128)
    Models.grid(
      mt.asInstanceOf[Byte], st.asInstanceOf[Long], et.asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]],
      mn.asInstanceOf[Float], mx.asInstanceOf[Float],
      values.eval(input).asInstanceOf[Array[Byte]],
      residuals.eval(input).asInstanceOf[Array[Byte]],
      tsBuf, vBuf)
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i < tsBuf.length
      override def next(): InternalRow = {
        val r = new GenericInternalRow(2)
        r.setLong(0, tsBuf(i))
        r.setFloat(1, vBuf(i))
        i += 1
        r
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3),
      newChildren(4), newChildren(5), newChildren(6), newChildren(7))
}
