package graft.tsdb

import org.apache.spark.sql.catalyst.expressions.{
  Add, AttributeReference, Cast, Divide, EqualTo, Expression, GreaterThan,
  If, IsNotNull, Literal, Multiply, Subtract}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Merges per-segment `(count, Σv, m2)` partials into the group's centered
  * second moment `M2 = Σ(v − μ_group)²` with Chan's parallel update — the
  * same merge Spark's own Welford-based `var_samp` applies between
  * partitions — instead of summing raw Σv² and subtracting `(Σv)²/n`
  * (textbook catastrophic cancellation: for mean ≈ 10⁶, σ ≈ 10⁻³ the
  * subtraction needs ~10⁻¹⁸ relative precision and a clamped result
  * silently collapses to 0).
  *
  * Input rows: `cnt` (LONG, ≥ 0), `sum` (DOUBLE, Σv of the partial), `m2`
  * (DOUBLE, Σ(v − mean_partial)² of the partial — 0 for a single point or
  * a constant run). Rows with NULL or 0 `cnt` are skipped, so `when(cond,
  * partial)` gating works unchanged. Returns the merged M2 (DOUBLE), NULL
  * when no points were merged. Buffer state is (n, avg, m2) — three
  * doubles, same as Spark's CentralMomentAgg.
  *
  * Update step folding partial i into the buffer (Chan et al. 1979,
  * the m2_b term generalized from 0 to the partial's own moment):
  *   δ  = mean_i − avg;  r = δ·n_i / (n + n_i)
  *   avg' = avg + r;     m2' = m2 + m2_i + δ·r·n
  */
case class PartialM2Merge(cnt: Expression, sumv: Expression, m2v: Expression)
  extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(cnt, sumv, m2v)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "partial_m2_merge"

  private lazy val n = AttributeReference("n", DoubleType, nullable = false)()
  private lazy val avg = AttributeReference("avg", DoubleType, nullable = false)()
  private lazy val m2 = AttributeReference("m2", DoubleType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(n, avg, m2)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(0.0))

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = Seq(IsNotNull(cnt), GreaterThan(Cast(cnt, LongType), Literal(0L)),
      IsNotNull(sumv), IsNotNull(m2v)).reduce[Expression](
      org.apache.spark.sql.catalyst.expressions.And(_, _))
    val inN = Cast(cnt, DoubleType)
    val inAvg = Divide(Cast(sumv, DoubleType), inN)
    val inM2 = Cast(m2v, DoubleType)
    val newN = Add(n, inN)
    val delta = Subtract(inAvg, avg)
    val deltaN = Divide(Multiply(delta, inN), newN)
    Seq(
      If(valid, newN, n),
      If(valid, Add(avg, deltaN), avg),
      If(valid, Add(Add(m2, inM2), Multiply(Multiply(delta, deltaN), n)), m2))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val newN = Add(n.left, n.right)
    val delta = Subtract(avg.right, avg.left)
    val deltaN = If(EqualTo(newN, Literal(0.0)), Literal(0.0),
      Divide(Multiply(delta, n.right), newN))
    Seq(
      newN,
      Add(avg.left, deltaN),
      Add(Add(m2.left, m2.right), Multiply(Multiply(delta, deltaN), n.left)))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(n, Literal(0.0)), Literal(null, DoubleType), m2)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2))
}

/** Elementwise sum of fixed-width `array<long>` partials — ONE aggregate
  * column regardless of width, where a per-slot `sum(element_at(...))`
  * projection pays codegen and planning linear in the width. The
  * distributed exact-rank ladder reduces its per-segment probe-count
  * arrays (width 256-512) with this.
  */
case class LongVectorSum(child: org.apache.spark.sql.catalyst.expressions.Expression,
    width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

  override def createAggregationBuffer(): Array[Long] = new Array[Long](width)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val a = child.eval(input).asInstanceOf[ArrayData]
    if (a != null) {
      val m = math.min(width, a.numElements())
      var i = 0
      while (i < m) { b(i) += a.getLong(i); i += 1 }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < width) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * width)
    bb.asLongBuffer().put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](width)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVectorSum =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "long_vector_sum"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongVectorSum =
    copy(child = newChildren(0))
}
