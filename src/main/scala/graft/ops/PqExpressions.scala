package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (static forwarders callable from generated
  * code, same pattern as [[KernelCalls]]). A D-dim float vector is split
  * into `m` subvectors; each subvector is replaced by the index of its
  * nearest codebook entry (L2, ties to the smallest index), and the `m`
  * byte-sized indices pack into ONE long — e.g. 64 floats (256 bytes)
  * become 8 bytes of code + an 8-byte norm, a 16x-compressed scoring
  * index that fits executor memory at corpus scales where vectors don't.
  *
  * Queries score codes by asymmetric distance computation (ADC): a
  * per-query lookup table of subvector-to-codeword dot products turns
  * scoring one code into `m` array lookups instead of D multiplications.
  * All arithmetic folds in index order in f64, so an external engine
  * replaying the same folds reproduces scores bit-for-bit (the DuckDB
  * oracle does exactly that).
  */
object PqKernels {

  /** Pack the per-subspace argmin codeword indices into a long
    * (subspace 0 in the lowest byte). `codebook` holds full-dimension
    * vectors; subspace `mm` of codeword `j` is `codebook(j)` at offsets
    * `[mm*sub, (mm+1)*sub)`.
    */
  def encode(vec: ArrayData, codebook: Array[Array[Float]], m: Int): Long = {
    val v = vec.toFloatArray()
    val sub = v.length / m
    var code = 0L
    var mm = 0
    while (mm < m) {
      val off = mm * sub
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < codebook.length) {
        val c = codebook(j)
        var d = 0.0
        var t = 0
        while (t < sub) {
          val diff = v(off + t).toDouble - c(off + t).toDouble
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      code |= best.toLong << (mm * 8)
      mm += 1
    }
    code
  }

  /** ADC lookup table for a query vector: entry `mm * k + j` is the dot
    * product of the query's subspace `mm` with codeword `j`'s subspace
    * `mm` (`k` = codebook size).
    */
  def lut(query: ArrayData, codebook: Array[Array[Float]], m: Int): ArrayData = {
    val q = query.toFloatArray()
    val sub = q.length / m
    val k = codebook.length
    val out = new Array[Double](m * k)
    var mm = 0
    while (mm < m) {
      val off = mm * sub
      var j = 0
      while (j < k) {
        val c = codebook(j)
        var d = 0.0
        var t = 0
        while (t < sub) {
          d += q(off + t).toDouble * c(off + t).toDouble
          t += 1
        }
        out(mm * k + j) = d
        j += 1
      }
      mm += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Approximate dot product of the encoded vector with the LUT's query:
    * `m` lookups summed in subspace order (`m` = lut length / `k`).
    */
  def adc(code: Long, lut: ArrayData, k: Int): Double = {
    val n = lut.numElements()
    val m = n / k
    var s = 0.0
    var mm = 0
    while (mm < m) {
      s += lut.getDouble(mm * k + ((code >>> (mm * 8)) & 0xffL).toInt)
      mm += 1
    }
    s
  }

  /** Euclidean norm, f64 accumulation in index order. */
  def norm(vec: ArrayData): Double = {
    val v = vec.toFloatArray()
    var s = 0.0
    var t = 0
    while (t < v.length) { s += v(t).toDouble * v(t).toDouble; t += 1 }
    math.sqrt(s)
  }
}

/** Base for PQ expressions carrying the codebook as a reference object
  * (embedded via `addReferenceObj` in generated code; interpreted eval
  * uses the same [[PqKernels]] statics).
  */
abstract class PqCodebookExpression extends UnaryExpression {
  def codebook: Array[Array[Float]]

  protected def floatArrayInput(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (floatArrayInput(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float>, got ${child.dataType.catalogString}")
}

/** `pq_encode(vec)` → packed codeword long. */
case class PqEncodeExpr(child: Expression, codebook: Array[Array[Float]], m: Int)
  extends PqCodebookExpression {
  require(m >= 1 && m <= 8 && codebook.nonEmpty && codebook.length <= 256)
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], codebook, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[][]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.ops.PqKernels.encode($in, $cb, $m);")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

/** `pq_lut(query_vec)` → array<double> ADC table (m * |codebook|). */
case class PqLutExpr(child: Expression, codebook: Array[Array[Float]], m: Int)
  extends PqCodebookExpression {
  require(m >= 1 && m <= 8 && codebook.nonEmpty && codebook.length <= 256)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.lut(input.asInstanceOf[ArrayData], codebook, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[][]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.ops.PqKernels.lut($in, $cb, $m);")
  }
  override protected def withNewChildInternal(c: Expression): PqLutExpr =
    copy(child = c)
}

/** `pq_adc(code, lut)` → approximate dot product (`k` = codebook size). */
case class PqAdcExpr(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {
  require(k >= 1 && k <= 256)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (bigint, array<double>), got ${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(code: Any, lut: Any): Any =
    PqKernels.adc(code.asInstanceOf[Long], lut.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, lut) =>
      s"${ev.value} = graft.ops.PqKernels.adc($code, $lut, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

/** `vec_norm(vec)` → f64 Euclidean norm. */
case class VecNormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float>, got ${dt.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.norm(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.ops.PqKernels.norm($in);")

  override protected def withNewChildInternal(c: Expression): VecNormExpr =
    copy(child = c)
}
