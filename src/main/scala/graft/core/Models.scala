package graft.core

/** Shared model-type helpers: error-bound semantics, segment length / sum /
  * grid dispatch over the three model types.
  *
  * Port of /root/reference/crates/modelardb_compression/src/models/mod.rs:36-284.
  */
object Models {
  val PmcMeanId: Byte = 0
  val SwingId: Byte = 1
  val MacaqueVId: Byte = 2

  val ModelTypeNames: Array[String] = Array("pmc_mean", "swing", "macaque_v")

  /** Bytes of fixed per-segment metadata (model_type_id + start/end time +
    * min/max value + error); variable-width binary columns excluded
    * (/root/reference/crates/modelardb_types/src/schemas.rs:54-64).
    */
  val CompressedMetadataSizeInBytes: Int = 1 + 8 + 8 + 4 + 4 + 4

  val ValueSizeInBytes: Int = 4
  val ValueSizeInBits: Int = 32

  /** IEEE-754 min with Rust semantics: if one argument is NaN, the other is
    * returned (java.lang.Math.min instead propagates NaN).
    */
  def fmin(a: Float, b: Float): Float =
    if (a.isNaN) b else if (b.isNaN) a else math.min(a, b)

  def fmax(a: Float, b: Float): Float =
    if (a.isNaN) b else if (b.isNaN) a else math.max(a, b)

  def fminD(a: Double, b: Double): Double =
    if (a.isNaN) b else if (b.isNaN) a else math.min(a, b)

  def fmaxD(a: Double, b: Double): Double =
    if (a.isNaN) b else if (b.isNaN) a else math.max(a, b)

  def equalOrNan(v1: Double, v2: Double): Boolean =
    v1 == v2 || (v1.isNaN && v2.isNaN)

  /** Is `approximateValue` within `errorBound` of `realValue`? NaN/±Inf are
    * only within bound of themselves.
    */
  def isValueWithinErrorBound(
      errorBound: ErrorBound, realValue: Float, approximateValue: Float): Boolean =
    errorBound match {
      case ErrorBound.Absolute(bound) =>
        if (equalOrNan(realValue.toDouble, approximateValue.toDouble)) true
        else math.abs(realValue - approximateValue) <= bound
      case ErrorBound.Relative(bound) =>
        if (equalOrNan(realValue.toDouble, approximateValue.toDouble)) true
        else {
          val difference = realValue - approximateValue
          val result = math.abs(difference / realValue)
          (result * 100.0f) <= bound
        }
      case ErrorBound.Lossless =>
        equalOrNan(realValue.toDouble, approximateValue.toDouble)
    }

  /** Maximum allowed deviation from `value`, deliberately slightly below the
    * bound to absorb floating-point inaccuracy.
    */
  def maximumAllowedDeviation(errorBound: ErrorBound, value: Double): Double =
    errorBound match {
      case ErrorBound.Absolute(bound) => bound.toDouble * 0.99
      case ErrorBound.Relative(bound) => math.abs(value * (bound.toDouble / 100.1))
      case ErrorBound.Lossless => 0.0
    }

  /** Number of residual values stored in the segment (count in last byte). */
  def residualsLength(residuals: Array[Byte]): Int =
    if (residuals.isEmpty) 0 else residuals(residuals.length - 1) & 0xff

  /** Number of data points in a compressed segment. */
  def len(startTime: Long, endTime: Long, timestamps: Array[Byte]): Int =
    TimestampCodec.len(startTime, endTime, timestamps)

  /** Mean value stored for a PMC-Mean model
    * (/root/reference/crates/modelardb_compression/src/types.rs:307-321).
    */
  def decodeValuesForPmcMean(
      minValue: Float, maxValue: Float, values: Array[Byte]): Float =
    values.length match {
      case 0 => minValue
      case 1 => maxValue
      case 4 => leFloat(values, 0)
      case n => throw new IllegalArgumentException(s"Unknown pmc_mean encoding of $n bytes.")
    }

  /** (firstValue, lastValue) stored for a Swing model
    * (/root/reference/crates/modelardb_compression/src/types.rs:374-407).
    */
  def decodeValuesForSwing(
      minValue: Float, maxValue: Float, values: Array[Byte]): (Float, Float) =
    values.length match {
      case 0 => (minValue, maxValue)
      case 1 => (maxValue, minValue)
      case 5 =>
        val value = leFloat(values, 1)
        (values(0): Int) match {
          case 0 => (value, maxValue)
          case 1 => (maxValue, value)
          case 2 => (minValue, value)
          case 3 => (value, minValue)
          case f => throw new IllegalArgumentException(s"Unknown swing flag $f.")
        }
      case 8 => (leFloat(values, 0), leFloat(values, 4))
      case n => throw new IllegalArgumentException(s"Unknown swing encoding of $n bytes.")
    }

  private[core] def leFloat(bytes: Array[Byte], offset: Int): Float = {
    val bits = (bytes(offset) & 0xff) |
      ((bytes(offset + 1) & 0xff) << 8) |
      ((bytes(offset + 2) & 0xff) << 16) |
      ((bytes(offset + 3) & 0xff) << 24)
    java.lang.Float.intBitsToFloat(bits)
  }

  private[core] def leBytes(value: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToRawIntBits(value)
    Array[Byte](
      (bits & 0xff).toByte, ((bits >>> 8) & 0xff).toByte,
      ((bits >>> 16) & 0xff).toByte, ((bits >>> 24) & 0xff).toByte)
  }

  /** Sum of a segment's values from model + residuals without gridding. */
  def sum(
      modelTypeId: Byte, startTime: Long, endTime: Long, timestamps: Array[Byte],
      minValue: Float, maxValue: Float, values: Array[Byte],
      residuals: Array[Byte]): Float = {
    val residualsLen = residualsLength(residuals)
    val modelLength = len(startTime, endTime, timestamps) - residualsLen

    var modelLastValue = Float.NaN
    val modelSum = (modelTypeId: Int) match {
      case 0 =>
        val value = decodeValuesForPmcMean(minValue, maxValue, values)
        modelLastValue = value
        PmcMean.sum(modelLength, value)
      case 1 =>
        val (firstValue, lastValue) = decodeValuesForSwing(minValue, maxValue, values)
        modelLastValue = lastValue
        Swing.sum(startTime, endTime, timestamps, firstValue, lastValue, residualsLen)
      case 2 =>
        // A segment with values compressed by Gorilla never has residuals.
        MacaqueV.sum(modelLength, values, hasModelLastValue = false, 0.0f)
      case other => throw new IllegalArgumentException(s"Unknown model type $other.")
    }

    if (residuals.isEmpty) modelSum
    else {
      val residualsSum = MacaqueV.sum(
        residualsLen,
        java.util.Arrays.copyOfRange(residuals, 0, residuals.length - 1),
        hasModelLastValue = true, modelLastValue)
      modelSum + residualsSum
    }
  }

  /** Segment sum with double accumulation: decodes the same f32 values as
    * [[grid]] but sums them in f64, so aggregate totals match any engine
    * summing the reconstructed float values (the f32-accumulating [[sum]]
    * mirrors the reference and drifts ~1e-4 relative on long segments).
    */
  def sumDouble(
      modelTypeId: Byte, startTime: Long, endTime: Long, timestamps: Array[Byte],
      minValue: Float, maxValue: Float, values: Array[Byte],
      residuals: Array[Byte]): Double = {
    val ts = new LongBuf(64)
    val vs = new FloatBuf(64)
    grid(modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
      values, residuals, ts, vs)
    var sum = 0.0
    var i = 0
    val n = vs.length
    val arr = vs.backing
    while (i < n) { sum += arr(i); i += 1 }
    sum
  }

  /** Per-segment (Σv, m2 = Σ(v − mean_seg)²), f64-accumulated over the
    * same f32 values as [[grid]] — ONE decode answers both the sum and
    * the centered-second-moment partials behind the VAR/STDDEV closed
    * forms.
    */
  def sumStats(
      modelTypeId: Byte, startTime: Long, endTime: Long, timestamps: Array[Byte],
      minValue: Float, maxValue: Float, values: Array[Byte],
      residuals: Array[Byte]): Array[Double] = {
    val ts = new LongBuf(64)
    val vs = new FloatBuf(64)
    grid(modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
      values, residuals, ts, vs)
    var sum = 0.0
    var i = 0
    val n = vs.length
    val arr = vs.backing
    while (i < n) {
      sum += arr(i)
      i += 1
    }
    // Second moment CENTERED on the segment mean (two-pass — the values
    // are already in memory): Σ(v − mean)² stays ~n·σ² regardless of the
    // mean's magnitude, where raw Σv² − (Σv)²/n cancels catastrophically
    // for large-mean/low-variance series. Cross-segment merge is Chan's
    // update (graft.tsdb.PartialM2Merge).
    val mean = if (n == 0) 0.0 else sum / n
    var m2 = 0.0
    i = 0
    while (i < n) {
      val d = arr(i).toDouble - mean
      m2 += d * d
      i += 1
    }
    Array(sum, m2)
  }

  /** A segment's chronologically first and last values, WITHOUT
    * materializing the point stream: PMC answers from its stored constant
    * in O(1); Swing replays the grid's exact slope·t+intercept double
    * arithmetic at just the two endpoint timestamps (bit-identical to the
    * gridded endpoints, O(1) for regular segments); MacaqueV walks only
    * its value bit-stream (timestamps never decode beyond the O(1)
    * length); residual tails (≤255 values) decode their short stream.
    * Uncommon shapes (model-less segments) fall back to the full grid.
    */
  def edgeValues(
      modelTypeId: Byte, startTime: Long, endTime: Long, timestamps: Array[Byte],
      minValue: Float, maxValue: Float, values: Array[Byte],
      residuals: Array[Byte]): Array[Float] = {
    def gridFallback(): Array[Float] = {
      val ts = new LongBuf(64)
      val vs = new FloatBuf(64)
      grid(modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
        values, residuals, ts, vs)
      Array(vs.backing(0), vs.last)
    }
    val resLen = residualsLength(residuals)
    val totalLen = TimestampCodec.len(startTime, endTime, timestamps)
    val modelLen = totalLen - resLen
    if (modelLen <= 0) return gridFallback()

    var first = 0.0f
    var modelLast = 0.0f
    (modelTypeId: Int) match {
      case 0 =>
        val v = decodeValuesForPmcMean(minValue, maxValue, values)
        first = v
        modelLast = v
      case 1 =>
        // The model's last point is end_time when there are no residuals,
        // else the (modelLen-1)th timestamp — O(1) for regular spacing,
        // a timestamp-only decode for irregular.
        val modelEndTime =
          if (resLen == 0) endTime
          else if (timestamps.isEmpty) (if (modelLen == 1) startTime else endTime)
          else if (TimestampCodec.areCompressedTimestampsRegular(timestamps)) {
            val interval = (endTime - startTime) / (totalLen - 1)
            startTime + (modelLen - 1).toLong * interval
          } else {
            val ts = new LongBuf(64)
            TimestampCodec.decompressAllTimestamps(startTime, endTime,
              timestamps, ts)
            ts.backing(modelLen - 1)
          }
        val (fv, lv) = decodeValuesForSwing(minValue, maxValue, values)
        val (slope, intercept) = Swing.computeSlopeAndIntercept(
          startTime, fv.toDouble, modelEndTime, lv.toDouble)
        first = (slope * startTime + intercept).toFloat
        modelLast = (slope * modelEndTime + intercept).toFloat
      case 2 =>
        // Values-only walk — the timestamp stream never materializes.
        val vs = new FloatBuf(math.max(modelLen, 16))
        MacaqueV.grid(values, modelLen, vs,
          hasModelLastValue = false, 0.0f)
        first = vs.backing(0)
        modelLast = vs.last
      case other =>
        throw new IllegalArgumentException(s"Unknown model type $other.")
    }

    if (resLen == 0) Array(first, modelLast)
    else {
      val rs = new FloatBuf(resLen + 1)
      MacaqueV.grid(
        java.util.Arrays.copyOfRange(residuals, 0, residuals.length - 1),
        resLen, rs, hasModelLastValue = true, modelLast)
      Array(first, rs.last)
    }
  }

  /** Reconstruct all (timestamp, value) pairs of a segment into the buffers. */
  def grid(
      modelTypeId: Byte, startTime: Long, endTime: Long, timestamps: Array[Byte],
      minValue: Float, maxValue: Float, values: Array[Byte], residuals: Array[Byte],
      timestampOut: LongBuf, valueOut: FloatBuf): Unit = {
    val residualsLen = residualsLength(residuals)

    val tsStart = timestampOut.length
    TimestampCodec.decompressAllTimestamps(startTime, endTime, timestamps, timestampOut)
    val tsTotal = timestampOut.length - tsStart
    val modelLen = tsTotal - residualsLen
    val ts = timestampOut.backing

    (modelTypeId: Int) match {
      case 0 =>
        val value = decodeValuesForPmcMean(minValue, maxValue, values)
        var i = 0
        while (i < modelLen) { valueOut.add(value); i += 1 }
      case 1 =>
        val (firstValue, lastValue) = decodeValuesForSwing(minValue, maxValue, values)
        val modelEndTime = ts(tsStart + modelLen - 1)
        Swing.grid(startTime, modelEndTime, firstValue, lastValue,
          ts, tsStart, tsStart + modelLen, valueOut)
      case 2 =>
        MacaqueV.grid(values, modelLen, valueOut, hasModelLastValue = false, 0.0f)
      case other => throw new IllegalArgumentException(s"Unknown model type $other.")
    }

    if (residuals.nonEmpty) {
      val modelLastValue = valueOut.last
      MacaqueV.grid(
        java.util.Arrays.copyOfRange(residuals, 0, residuals.length - 1),
        residualsLen, valueOut, hasModelLastValue = true, modelLastValue)
    }
  }
}
