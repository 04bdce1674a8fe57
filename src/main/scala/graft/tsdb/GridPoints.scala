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

/** Per-bucket partial aggregates computed inside the decode loop: one
  * output row per epoch-floor bucket the segment's (range-clipped) points
  * fall in, instead of one row per point. A downsampling aggregate over
  * bucket-straddling segments emits O(buckets per segment) rows where
  * gridding emits O(points) — at 100 TB the point stream never
  * materializes, and the HashAggregate above merges tiny partials.
  * `bucketUs = Long.MaxValue` degenerates to one partial per segment,
  * which is exactly what a range aggregate's boundary side needs.
  *
  * Rows are (bucket, cnt, sum, min, max, tmin, tmax); emission flushes on
  * bucket change, so correctness does NOT depend on decode order —
  * out-of-order timestamps only produce extra partial rows that the
  * downstream merge (sum/sum/min/max/min/max) combines to the same totals.
  * The tmin/tmax columns are the bucket's first/last in-range timestamps,
  * letting `min/max(ts)` under a time range or bucket grouping answer
  * without ever materializing points.
  */
case class BucketPartials(
    bucketUs: Long, rangeStartUs: Option[Long], rangeEndUs: Option[Long],
    modelTypeId: Expression, startTime: Expression, endTime: Expression,
    timestamps: Expression, minValue: Expression, maxValue: Expression,
    values: Expression, residuals: Expression)
  extends Expression with Generator with CodegenFallback {

  require(bucketUs > 0, "Bucket width must be positive.")

  override def children: Seq[Expression] = Seq(
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
    values, residuals)

  override def elementSchema: StructType = StructType(Seq(
    StructField("__graft_bucket", LongType, nullable = false),
    StructField("__bp_cnt", LongType, nullable = false),
    StructField("__bp_sum", DoubleType, nullable = false),
    StructField("__bp_min", FloatType, nullable = false),
    StructField("__bp_max", FloatType, nullable = false),
    StructField("__bp_tmin", LongType, nullable = false),
    StructField("__bp_tmax", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val mt = modelTypeId.eval(input)
    val st = startTime.eval(input)
    val et = endTime.eval(input)
    val mn0 = minValue.eval(input)
    val mx0 = maxValue.eval(input)
    if (mt == null || st == null || et == null || mn0 == null || mx0 == null) {
      return Iterator.empty
    }
    val tsBuf = new LongBuf(128)
    val vBuf = new FloatBuf(128)
    Models.grid(
      mt.asInstanceOf[Byte], st.asInstanceOf[Long], et.asInstanceOf[Long],
      timestamps.eval(input).asInstanceOf[Array[Byte]],
      mn0.asInstanceOf[Float], mx0.asInstanceOf[Float],
      values.eval(input).asInstanceOf[Array[Byte]],
      residuals.eval(input).asInstanceOf[Array[Byte]],
      tsBuf, vBuf)

    val lo = rangeStartUs.getOrElse(Long.MinValue)
    val hi = rangeEndUs.getOrElse(Long.MaxValue)
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](4)
    var bucket = 0L
    var cnt = 0L
    var sum = 0.0
    var mn = Float.PositiveInfinity // running extremes over non-NaN values
    var mx = Float.NegativeInfinity
    var nanSeen = false
    var nonNanSeen = false
    var tmn = Long.MaxValue
    var tmx = Long.MinValue
    def flush(): Unit = if (cnt > 0) {
      val r = new GenericInternalRow(7)
      r.setLong(0, bucket)
      r.setLong(1, cnt)
      r.setDouble(2, sum)
      // Spark's float ordering sorts NaN greatest: MIN ignores NaN unless
      // every value is NaN, MAX is NaN as soon as one value is. The ±Inf
      // init sentinels never escape — an all-NaN bucket is (NaN, NaN).
      r.setFloat(3, if (nonNanSeen) mn else Float.NaN)
      r.setFloat(4, if (nanSeen) Float.NaN else mx)
      r.setLong(5, tmn)
      r.setLong(6, tmx)
      out += r
    }
    var i = 0
    while (i < tsBuf.length) {
      val t = tsBuf(i)
      if (t >= lo && t <= hi) {
        val b = Math.floorDiv(t, bucketUs) * bucketUs
        if (cnt > 0 && b != bucket) {
          flush(); cnt = 0; sum = 0.0
          mn = Float.PositiveInfinity; mx = Float.NegativeInfinity
          nanSeen = false; nonNanSeen = false
          tmn = Long.MaxValue; tmx = Long.MinValue
        }
        bucket = b
        val v = vBuf(i)
        cnt += 1
        sum += v
        if (java.lang.Float.isNaN(v)) nanSeen = true
        else {
          nonNanSeen = true
          if (v < mn) mn = v
          if (v > mx) mx = v
        }
        if (t < tmn) tmn = t
        if (t > tmx) tmx = t
      }
      i += 1
    }
    flush()
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(bucketUs, rangeStartUs, rangeEndUs, newChildren(0), newChildren(1),
      newChildren(2), newChildren(3), newChildren(4), newChildren(5),
      newChildren(6), newChildren(7))
}
