package graft.tsdb

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.core.{FloatBuf, LongBuf, Models}

/** Static decode kernels shared by the generators' interpreted eval and
  * their generated code: each produces the per-segment output rows as one
  * ArrayData, which GenerateExec's whole-stage codegen iterates inline
  * (the Inline-generator contract). The decode loop itself stays a single
  * JVM call per segment — what codegen buys is fusing the per-row
  * iteration with the downstream filter/project/partial-aggregate instead
  * of breaking the stage at the Generate boundary.
  */
object DecodeKernels {
  private val empty = new GenericArrayData(Array.empty[Any])

  def emptyArray(): ArrayData = empty

  /** Reconstructed (timestamp, value) rows of one segment. */
  def gridArray(mt: Byte, st: Long, et: Long, tsBytes: Array[Byte],
      mn: Float, mx: Float, values: Array[Byte],
      residuals: Array[Byte]): ArrayData = {
    val tsBuf = new LongBuf(128)
    val vBuf = new FloatBuf(128)
    Models.grid(mt, st, et, tsBytes, mn, mx, values, residuals, tsBuf, vBuf)
    val out = new Array[Any](tsBuf.length)
    var i = 0
    while (i < tsBuf.length) {
      val r = new GenericInternalRow(2)
      r.setLong(0, tsBuf(i))
      r.setFloat(1, vBuf(i))
      out(i) = r
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-bucket partial rows (bucket, cnt, sum, m2, min, max, tmin,
    * tmax[, vfirst, vlast]) of one segment, range-clipped to [lo, hi] —
    * with `withEdges`, vfirst/vlast are the values at tmin/tmax, the
    * in-bucket chronological edges behind FIRST/LAST (plans not asking
    * for edges keep the 8-field row and pay nothing). Emission flushes on
    * bucket change, so correctness does NOT depend on decode order —
    * out-of-order timestamps only produce extra partial rows that the
    * downstream merge combines to the same totals (the edge merge is
    * min_by/max_by on tmin/tmax, equally order-free).
    */
  def bucketPartialsArray(bucketUs: Long, lo: Long, hi: Long,
      withEdges: Boolean,
      mt: Byte, st: Long, et: Long, tsBytes: Array[Byte],
      mn0: Float, mx0: Float, values: Array[Byte],
      residuals: Array[Byte]): ArrayData = {
    val tsBuf = new LongBuf(128)
    val vBuf = new FloatBuf(128)
    Models.grid(mt, st, et, tsBytes, mn0, mx0, values, residuals, tsBuf, vBuf)

    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var bucket = 0L
    var cnt = 0L
    var sum = 0.0
    // Welford running mean/moment: the partial carries the CENTERED
    // second moment m2 = Σ(v − mean_bucket)², merged downstream with
    // Chan's update (PartialM2Merge) — never the cancellation-prone Σv².
    var bmean = 0.0
    var m2 = 0.0
    var mn = Float.PositiveInfinity // running extremes over non-NaN values
    var mx = Float.NegativeInfinity
    var nanSeen = false
    var nonNanSeen = false
    var tmn = Long.MaxValue
    var tmx = Long.MinValue
    var vFirst = 0.0f
    var vLast = 0.0f
    def flush(): Unit = if (cnt > 0) {
      val r = new GenericInternalRow(if (withEdges) 10 else 8)
      r.setLong(0, bucket)
      r.setLong(1, cnt)
      r.setDouble(2, sum)
      r.setDouble(3, m2)
      // Spark's float ordering sorts NaN greatest: MIN ignores NaN unless
      // every value is NaN, MAX is NaN as soon as one value is. The ±Inf
      // init sentinels never escape — an all-NaN bucket is (NaN, NaN).
      r.setFloat(4, if (nonNanSeen) mn else Float.NaN)
      r.setFloat(5, if (nanSeen) Float.NaN else mx)
      r.setLong(6, tmn)
      r.setLong(7, tmx)
      if (withEdges) {
        r.setFloat(8, vFirst)
        r.setFloat(9, vLast)
      }
      out += r
    }
    var i = 0
    while (i < tsBuf.length) {
      val t = tsBuf(i)
      if (t >= lo && t <= hi) {
        val b = Math.floorDiv(t, bucketUs) * bucketUs
        if (cnt > 0 && b != bucket) {
          flush(); cnt = 0; sum = 0.0; bmean = 0.0; m2 = 0.0
          mn = Float.PositiveInfinity; mx = Float.NegativeInfinity
          nanSeen = false; nonNanSeen = false
          tmn = Long.MaxValue; tmx = Long.MinValue
        }
        bucket = b
        val v = vBuf(i)
        cnt += 1
        sum += v
        val d = v.toDouble - bmean
        bmean += d / cnt.toDouble
        m2 += d * (v.toDouble - bmean)
        if (java.lang.Float.isNaN(v)) nanSeen = true
        else {
          nonNanSeen = true
          if (v < mn) mn = v
          if (v > mx) mx = v
        }
        if (t < tmn) { tmn = t; vFirst = v }
        if (t > tmx) { tmx = t; vLast = v }
      }
      i += 1
    }
    flush()
    new GenericArrayData(out.toArray)
  }

  /** Non-empty (bin, count) histogram rows of one segment's finite values
    * at timestamps within [lo, hi] ([[graft.core.ValueCounts.histogram]]).
    */
  def histogramArray(origin: Double, width: Double, lo: Long, hi: Long,
      sparkBins: Boolean,
      mt: Byte, st: Long, et: Long, tsBytes: Array[Byte],
      mn: Float, mx: Float, values: Array[Byte],
      residuals: Array[Byte]): ArrayData = {
    val pairs = graft.core.ValueCounts.histogram(origin, width, lo, hi,
      mt, st, et, tsBytes, mn, mx, values, residuals, sparkBins)
    val out = new Array[Any](pairs.length / 2)
    var i = 0
    while (i < out.length) {
      val r = new GenericInternalRow(2)
      r.setLong(0, pairs(2 * i))
      r.setLong(1, pairs(2 * i + 1))
      out(i) = r
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Shared shape of the decode generators: Inline-style collection
  * generators whose doGenCode is one static kernel call, so GenerateExec
  * keeps the surrounding pipeline in whole-stage codegen.
  */
private[tsdb] trait DecodeGenerator extends Generator with CollectionGenerator {
  def modelTypeId: Expression
  def startTime: Expression
  def endTime: Expression
  def timestamps: Expression
  def minValue: Expression
  def maxValue: Expression
  def values: Expression
  def residuals: Expression

  override def children: Seq[Expression] = Seq(
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)

  override def collectionType: DataType =
    ArrayType(elementSchema, containsNull = false)
  override val inline: Boolean = true
  override val position: Boolean = false

  /** Java call producing the segment's ArrayData from the evaluated child
    * values (in children order).
    */
  protected def kernelCall(args: Seq[String]): String

  protected def rowsOf(input: InternalRow): ArrayData = {
    val mt = modelTypeId.eval(input)
    val st = startTime.eval(input)
    val et = endTime.eval(input)
    val mn = minValue.eval(input)
    val mx = maxValue.eval(input)
    if (mt == null || st == null || et == null || mn == null || mx == null) {
      DecodeKernels.emptyArray()
    } else {
      evalKernel(
        mt.asInstanceOf[Byte], st.asInstanceOf[Long], et.asInstanceOf[Long],
        timestamps.eval(input).asInstanceOf[Array[Byte]],
        mn.asInstanceOf[Float], mx.asInstanceOf[Float],
        values.eval(input).asInstanceOf[Array[Byte]],
        residuals.eval(input).asInstanceOf[Array[Byte]])
    }
  }

  protected def evalKernel(mt: Byte, st: Long, et: Long, ts: Array[Byte],
      mn: Float, mx: Float, values: Array[Byte],
      residuals: Array[Byte]): ArrayData

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = rowsOf(input)
    val n = elementSchema.length
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i < arr.numElements()
      override def next(): InternalRow = { i += 1; arr.getStruct(i - 1, n) }
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arrCls = classOf[ArrayData].getName
    val anyNull = Seq(evals(0), evals(1), evals(2), evals(4), evals(5))
      .map(_.isNull).mkString("(", " || ", ")")
    val call = kernelCall(evals.map(_.value.toString))
    val childCode = evals.map(_.code).reduce(_ + _)
    ev.copy(
      code = childCode +
        code"""
           |$arrCls ${ev.value} = null;
           |if ($anyNull) {
           |  ${ev.value} = graft.tsdb.DecodeKernels.emptyArray();
           |} else {
           |  ${ev.value} = $call;
           |}
           """.stripMargin,
      isNull = FalseLiteral)
  }
}

/** Native Catalyst generator reconstructing a segment's data points — the
  * expression-level form of the reference's GridExec
  * (/root/reference/crates/modelardb_storage/src/query/grid_exec.rs:56-437).
  *
  * Compared to the earlier `explode(udf(...))` formulation this emits
  * (timestamp, value) rows straight from the decode buffers: no per-point
  * Tuple2 allocation, no CatalystTypeConverters pass over a materialized
  * array, and no follow-up struct-field projection. As an Inline-style
  * collection generator with real codegen, the Generate operator and its
  * consumers stay inside one whole-stage-codegen span.
  */
case class GridPoints(
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression with DecodeGenerator {

  override def elementSchema: StructType = StructType(Seq(
    StructField("__graft_ts", LongType, nullable = false),
    StructField("__graft_value", FloatType, nullable = false)))

  override protected def evalKernel(mt: Byte, st: Long, et: Long,
      ts: Array[Byte], mn: Float, mx: Float, values: Array[Byte],
      residuals: Array[Byte]): ArrayData =
    DecodeKernels.gridArray(mt, st, et, ts, mn, mx, values, residuals)

  override protected def kernelCall(args: Seq[String]): String =
    s"graft.tsdb.DecodeKernels.gridArray(${args.mkString(", ")})"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3),
      newChildren(4), newChildren(5), newChildren(6), newChildren(7))
}

/** Per-bucket partial aggregates computed inside the decode loop: one
  * output row per epoch-floor bucket the segment's (range-clipped) points
  * fall in, instead of one row per point. A downsampling aggregate over
  * bucket-straddling segments emits O(buckets per segment) rows where
  * gridding emits O(points) — at 100 TB the point stream never
  * materializes, and the HashAggregate above merges tiny partials.
  * `bucketUs = Long.MaxValue` degenerates to one partial per segment,
  * which is exactly what a range aggregate's boundary side needs.
  *
  * Rows are (bucket, cnt, sum, m2, min, max, tmin, tmax, vfirst,
  * vlast); see [[DecodeKernels.bucketPartialsArray]] for the
  * order-independence and NaN semantics. The tmin/tmax columns are the
  * bucket's first/last in-range timestamps (letting `min/max(ts)` under a
  * time range or bucket grouping answer without ever materializing
  * points); vfirst/vlast are the values AT those timestamps, the partials
  * behind chronological FIRST/LAST and the M4 downsample.
  */
case class BucketPartials(
    bucketUs: Long, rangeStartUs: Option[Long], rangeEndUs: Option[Long],
    withEdges: Boolean,
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression with DecodeGenerator {

  require(bucketUs > 0, "Bucket width must be positive.")

  private def lo: Long = rangeStartUs.getOrElse(Long.MinValue)
  private def hi: Long = rangeEndUs.getOrElse(Long.MaxValue)

  override def elementSchema: StructType = StructType(Seq(
    StructField("__graft_bucket", LongType, nullable = false),
    StructField("__bp_cnt", LongType, nullable = false),
    StructField("__bp_sum", DoubleType, nullable = false),
    StructField("__bp_m2", DoubleType, nullable = false),
    StructField("__bp_min", FloatType, nullable = false),
    StructField("__bp_max", FloatType, nullable = false),
    StructField("__bp_tmin", LongType, nullable = false),
    StructField("__bp_tmax", LongType, nullable = false)) ++
    (if (withEdges) Seq(
      StructField("__bp_vfirst", FloatType, nullable = false),
      StructField("__bp_vlast", FloatType, nullable = false))
    else Seq.empty))

  override protected def evalKernel(mt: Byte, st: Long, et: Long,
      ts: Array[Byte], mn: Float, mx: Float, values: Array[Byte],
      residuals: Array[Byte]): ArrayData =
    DecodeKernels.bucketPartialsArray(bucketUs, lo, hi, withEdges, mt, st,
      et, ts, mn, mx, values, residuals)

  override protected def kernelCall(args: Seq[String]): String =
    s"graft.tsdb.DecodeKernels.bucketPartialsArray(" +
      s"${bucketUs}L, ${lo}L, ${hi}L, $withEdges, ${args.mkString(", ")})"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(bucketUs, rangeStartUs, rangeEndUs, withEdges, newChildren(0),
      newChildren(1), newChildren(2), newChildren(3), newChildren(4),
      newChildren(5), newChildren(6), newChildren(7))
}

/** Per-bin value-histogram rows computed inside the decode machinery: one
  * (bin, cnt) output row per NON-EMPTY fixed-width value bin the segment's
  * (range-clipped) finite values fall in — the generator behind
  * segment-native value histograms. Only multi-bin (or NaN-capable)
  * segments reach this generator; single-bin segments are answered from
  * metadata alone by the caller. PMC segments emit one row in O(1); Swing
  * segments emit their bin runs by exact monotone binary search without
  * decoding; MacaqueV walks its value stream
  * ([[graft.core.ValueCounts.histogram]]).
  */
case class HistogramBins(
    binOrigin: Double, binWidth: Double,
    rangeStartUs: Option[Long], rangeEndUs: Option[Long],
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression,
    sparkBins: Boolean = false)
  extends Expression with DecodeGenerator {

  require(binWidth > 0, "Histogram width must be positive.")

  private def lo: Long = rangeStartUs.getOrElse(Long.MinValue)
  private def hi: Long = rangeEndUs.getOrElse(Long.MaxValue)

  override def elementSchema: StructType = StructType(Seq(
    StructField("__vh_bin", LongType, nullable = false),
    StructField("__vh_cnt", LongType, nullable = false)))

  override protected def evalKernel(mt: Byte, st: Long, et: Long,
      ts: Array[Byte], mn: Float, mx: Float, values: Array[Byte],
      residuals: Array[Byte]): ArrayData =
    DecodeKernels.histogramArray(binOrigin, binWidth, lo, hi, sparkBins,
      mt, st, et, ts, mn, mx, values, residuals)

  override protected def kernelCall(args: Seq[String]): String = {
    val originBits = java.lang.Double.doubleToRawLongBits(binOrigin)
    val widthBits = java.lang.Double.doubleToRawLongBits(binWidth)
    s"graft.tsdb.DecodeKernels.histogramArray(" +
      s"java.lang.Double.longBitsToDouble(${originBits}L), " +
      s"java.lang.Double.longBitsToDouble(${widthBits}L), " +
      s"${lo}L, ${hi}L, $sparkBins, ${args.mkString(", ")})"
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(binOrigin, binWidth, rangeStartUs, rangeEndUs, newChildren(0),
      newChildren(1), newChildren(2), newChildren(3), newChildren(4),
      newChildren(5), newChildren(6), newChildren(7), sparkBins)
}
