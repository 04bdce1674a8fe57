package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static-forwarder entry points for the [[Signatures]] kernels on
  * catalyst-native types, callable from generated code
  * (`graft.ops.KernelCalls.x(...)` — the same pattern as
  * `graft.tsdb.DecodeKernels`). Each method does the UTF8String/ArrayData
  * conversion once and runs the one-pass kernel; no row encoders, no
  * lambda interpretation.
  */
object KernelCalls {

  def simhash(text: UTF8String): Long = Signatures.simhash(text.toString)

  def wordShingles(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(
      Signatures.wordShingles(text.toString, n)
        .map(UTF8String.fromString(_): Any))

  def minhashBandKeys(
      text: UTF8String, numHashes: Int, bands: Int, shingleK: Int): ArrayData =
    new GenericArrayData(
      Signatures.minhashBandKeys(
        Signatures.minhash(text.toString, numHashes, shingleK), bands)
        .map(UTF8String.fromString(_): Any))

  def simhashChunks(sig: Long): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      Array.tabulate(4)(c => (sig >>> (c * 16)) & 0xffffL))

  def hyperplaneBandKeys(vec: ArrayData, bits: Int, bands: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      Signatures.hyperplaneBandKeys(vec.toFloatArray(), bits, bands))

  def rollingFingerprint(text: UTF8String, k: Int, divisor: Long): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      Signatures.rollingFingerprint(text.toString, k, divisor))

  def dupLineCharFraction(text: UTF8String): Double =
    Signatures.duplicateLineCharFraction(text.toString)

  def dupNgramFraction(text: UTF8String, n: Int): Double =
    Signatures.duplicateNgramFraction(text.toString, n)

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    def strings(x: ArrayData): Array[String] = {
      val n = x.numElements()
      val out = new Array[String](n)
      var i = 0
      while (i < n) { out(i) = x.getUTF8String(i).toString; i += 1 }
      out
    }
    Signatures.jaccard(strings(a), strings(b))
  }
}

/** Base for unary signature-kernel expressions: `eval` and `doGenCode`
  * both route through the same [[KernelCalls]] static, so interpreted and
  * generated paths are one implementation. Null input → null output (the
  * ScalaUDFs these replace crashed on null text; the corpus has none).
  */
abstract class SignatureKernelExpression extends UnaryExpression {
  /** Expected input type (nullability of array elements ignored). */
  protected def inputOk(dt: DataType): Boolean
  /** Java source for the kernel call on the bound input variable. */
  protected def genCall(input: String): String
  /** The interpreted twin of [[genCall]]. */
  protected def evalKernel(input: Any): Any

  override def checkInputDataTypes(): TypeCheckResult =
    if (inputOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName cannot take ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = evalKernel(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = ${genCall(in)};")
}

case class SimhashExpr(child: Expression) extends SignatureKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"
  protected def inputOk(dt: DataType): Boolean = dt == StringType
  protected def genCall(in: String): String =
    s"graft.ops.KernelCalls.simhash($in)"
  protected def evalKernel(in: Any): Any =
    KernelCalls.simhash(in.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): SimhashExpr =
    copy(child = c)
}

case class WordShinglesExpr(child: Expression, n: Int)
  extends SignatureKernelExpression {
  require(n >= 1, "shingle size must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  protected def inputOk(dt: DataType): Boolean = dt == StringType
  protected def genCall(in: String): String =
    s"graft.ops.KernelCalls.wordShingles($in, $n)"
  protected def evalKernel(in: Any): Any =
    KernelCalls.wordShingles(in.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(c: Expression): WordShinglesExpr =
    copy(child = c)
}

case class MinhashBandKeysExpr(
    child: Expression, numHashes: Int, bands: Int, shingleK: Int)
  extends SignatureKernelExpression {
  require(numHashes % bands == 0, "numHashes must divide evenly into bands")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"
  protected def inputOk(dt: DataType): Boolean = dt == StringType
  protected def genCall(in: String): String =
    s"graft.ops.KernelCalls.minhashBandKeys($in, $numHashes, $bands, $shingleK)"
  protected def evalKernel(in: Any): Any =
    KernelCalls.minhashBandKeys(in.asInstanceOf[UTF8String], numHashes, bands, shingleK)
  override protected def withNewChildInternal(c: Expression): MinhashBandKeysExpr =
    copy(child = c)
}

case class SimhashChunksExpr(child: Expression)
  extends SignatureKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_chunks"
  protected def inputOk(dt: DataType): Boolean = dt == LongType
  protected def genCall(in: String): String =
    s"graft.ops.KernelCalls.simhashChunks($in)"
  protected def evalKernel(in: Any): Any =
    KernelCalls.simhashChunks(in.asInstanceOf[Long])
  override protected def withNewChildInternal(c: Expression): SimhashChunksExpr =
    copy(child = c)
}

case class HyperplaneBandKeysExpr(child: Expression, bits: Int, bands: Int)
  extends SignatureKernelExpression {
  require(bits >= 1 && bits <= 63 && bands >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_band_keys"
  protected def inputOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def genCall(in: String): String =
    s"graft.ops.KernelCalls.hyperplaneBandKeys($in, $bits, $bands)"
  protected def evalKernel(in: Any): Any =
    KernelCalls.hyperplaneBandKeys(in.asInstanceOf[ArrayData], bits, bands)
  override protected def withNewChildInternal(c: Expression): HyperplaneBandKeysExpr =
    copy(child = c)
}

case class RollingFingerprintExpr(child: Expression, k: Int, divisor: Long)
  extends SignatureKernelExpression {
  require(k >= 1 && divisor >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_fingerprint"
  protected def inputOk(dt: DataType): Boolean = dt == StringType
  protected def genCall(in: String): String =
    s"graft.ops.KernelCalls.rollingFingerprint($in, $k, ${divisor}L)"
  protected def evalKernel(in: Any): Any =
    KernelCalls.rollingFingerprint(in.asInstanceOf[UTF8String], k, divisor)
  override protected def withNewChildInternal(c: Expression): RollingFingerprintExpr =
    copy(child = c)
}

case class DupLineCharFractionExpr(child: Expression)
  extends SignatureKernelExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dup_line_char_fraction"
  protected def inputOk(dt: DataType): Boolean = dt == StringType
  protected def genCall(in: String): String =
    s"graft.ops.KernelCalls.dupLineCharFraction($in)"
  protected def evalKernel(in: Any): Any =
    KernelCalls.dupLineCharFraction(in.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): DupLineCharFractionExpr =
    copy(child = c)
}

case class DupNgramFractionExpr(child: Expression, n: Int)
  extends SignatureKernelExpression {
  require(n >= 1, "n-gram size must be positive")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dup_ngram_fraction"
  protected def inputOk(dt: DataType): Boolean = dt == StringType
  protected def genCall(in: String): String =
    s"graft.ops.KernelCalls.dupNgramFraction($in, $n)"
  protected def evalKernel(in: Any): Any =
    KernelCalls.dupNgramFraction(in.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(c: Expression): DupNgramFractionExpr =
    copy(child = c)
}

/** Exact Jaccard of two shingle arrays — the LSH verify step's kernel. */
case class JaccardExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<string>, got ${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    KernelCalls.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ops.KernelCalls.jaccard($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardExpr =
    copy(left = newLeft, right = newRight)
}
