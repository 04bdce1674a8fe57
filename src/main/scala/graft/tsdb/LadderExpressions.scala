package graft.tsdb

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.core.ValueCounts

/** Compiled kernels for the distributed exact-rank ladder's array work.
  * Spark's higher-order array functions (transform/filter) evaluate their
  * lambdas INTERPRETED per element — at probe widths of 512-2048 keys per
  * group per round that interpretation dominated the round, so the three
  * hot array constructions are plain compiled loops behind codegen'd
  * expressions instead.
  */
object LadderKernels {

  /** The ladder points of one active bracket: m = min(fan, hi-lo) interior
    * points lo + (hi-lo)·j/(m+1), de-duplicated (they are non-decreasing
    * in j) and clamped to [lo, hi), falling back to the single point lo —
    * the exact arithmetic of the sequential ladder this replaces.
    */
  def ladderPoints(lo: Long, hi: Long, fan: Long): ArrayData = {
    val m = math.min(fan, hi - lo)
    val buf = new Array[Long](m.toInt)
    var nOut = 0
    var prev = Long.MinValue
    var j = 1L
    while (j <= m) {
      val p = lo + (hi - lo) * j / (m + 1)
      if (p != prev && p >= lo && p < hi) { buf(nOut) = p; nOut += 1 }
      prev = p
      j += 1
    }
    if (nOut == 0) { buf(0) = lo; nOut = 1 }
    new GenericArrayData(java.util.Arrays.copyOf(buf, nOut))
  }

  /** One group's probe array: each collected (r, pts) slice lands at the
    * FIXED slot block r·slice of its rank (r is the rank's group-stable
    * position from the state build), key→float→double converted, all
    * unused slots +Inf (the kernel's cheapest threshold). Fixed slots
    * make a row's count-slice offset a pure expression (r·slice) — no
    * per-round window prefix sum, no offset join.
    */
  def probeXs(structs: ArrayData, width: Int, slice: Int): ArrayData = {
    val out = new Array[Double](width)
    java.util.Arrays.fill(out, Double.PositiveInfinity)
    val nS = structs.numElements()
    var i = 0
    while (i < nS) {
      val r = structs.getStruct(i, 2)
      val base = r.getInt(0) * slice
      val a = r.getArray(1)
      var j = 0
      val n = a.numElements()
      while (j < n && base + j < width) {
        out(base + j) = ValueCounts.floatFromKey(a.getLong(j)).toDouble
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One bracket's update from the group's summed count array: among this
    * rank's points (count slice at `off`), the smallest satisfied point
    * (P(p): cnt(v > p) <= nk) and the largest unsatisfied one — returned
    * as a (minTrue, maxFalse) struct with NULL for an empty side.
    */
  def bracketMinMax(pts: ArrayData, cnts: ArrayData, off: Long,
      nk: Long): InternalRow = {
    var minT = 0L; var hasT = false
    var maxF = 0L; var hasF = false
    val m = pts.numElements()
    var j = 0
    while (j < m) {
      val p = pts.getLong(j)
      if (cnts.getLong((off + j).toInt) <= nk) {
        if (!hasT || p < minT) { minT = p; hasT = true }
      } else {
        if (!hasF || p > maxF) { maxF = p; hasF = true }
      }
      j += 1
    }
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    if (hasT) r.setLong(0, minT) else r.update(0, null)
    if (hasF) r.setLong(1, maxF) else r.update(1, null)
    r
  }
}

case class LadderPointsExpr(lo: Expression, hi: Expression, fan: Long)
  extends Expression {
  override def children: Seq[Expression] = Seq(lo, hi)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = LadderKernels.ladderPoints(
    lo.eval(input).asInstanceOf[Long], hi.eval(input).asInstanceOf[Long], fan)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val cls = classOf[ArrayData].getName
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |$cls ${ev.value} = graft.tsdb.LadderKernels.ladderPoints(
           |  ${evals(0).value}, ${evals(1).value}, ${fan}L);
           """.stripMargin,
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1))
}

case class ProbeXsExpr(structs: Expression, width: Int, slice: Int)
    extends Expression {
  override def children: Seq[Expression] = Seq(structs)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = LadderKernels.probeXs(
    structs.eval(input).asInstanceOf[ArrayData], width, slice)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val cls = classOf[ArrayData].getName
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |$cls ${ev.value} = graft.tsdb.LadderKernels.probeXs(
           |  ${evals(0).value}, $width, $slice);
           """.stripMargin,
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren(0))
}

case class BracketMinMaxExpr(pts: Expression, cnts: Expression,
    off: Expression, nk: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(pts, cnts, off, nk)
  override def dataType: DataType = StructType(Seq(
    StructField("minT", LongType, nullable = true),
    StructField("maxF", LongType, nullable = true)))
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = LadderKernels.bracketMinMax(
    pts.eval(input).asInstanceOf[ArrayData],
    cnts.eval(input).asInstanceOf[ArrayData],
    off.eval(input).asInstanceOf[Long], nk.eval(input).asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val cls = classOf[InternalRow].getName
    ev.copy(
      code = evals.map(_.code).reduce(_ + _) +
        code"""
           |$cls ${ev.value} = graft.tsdb.LadderKernels.bracketMinMax(
           |  ${evals.map(_.value).mkString(", ")});
           """.stripMargin,
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
}
