package graft.core

/** Swing: linear model maintained via upper/lower bound lines through the
  * first point, with a minimum-MSE slope chosen at the end. Doubles are used
  * internally for precision.
  *
  * Port of /root/reference/crates/modelardb_compression/src/models/swing.rs:34-340.
  */
final class Swing(errorBound: ErrorBound) {
  private var startTime: Long = 0L
  private var endTime: Long = 0L
  private var firstValue: Double = Double.NaN
  private var upperBoundSlope: Double = Double.NaN
  private var upperBoundIntercept: Double = Double.NaN
  private var lowerBoundSlope: Double = Double.NaN
  private var lowerBoundIntercept: Double = Double.NaN
  private var slopeWithMinimumMseNumerator: Double = 0.0
  private var slopeWithMinimumMseDenominator: Double = 0.0
  private var _length: Int = 0

  /** Try to extend the model with (`timestamp`, `value`); true iff it fits. */
  def fitDataPoint(timestamp: Long, value0: Float): Boolean = {
    val value = value0.toDouble
    val maximumDeviation = Models.maximumAllowedDeviation(errorBound, value)

    if (_length == 0) {
      startTime = timestamp
      endTime = timestamp
      firstValue = value
      _length += 1
      true
    } else if (!java.lang.Double.isFinite(firstValue) || !java.lang.Double.isFinite(value)) {
      // Extension over the paper: handle both infinities and NaN.
      if (Models.equalOrNan(firstValue, value)) {
        endTime = timestamp
        upperBoundSlope = value
        upperBoundIntercept = value
        lowerBoundSlope = value
        lowerBoundIntercept = value
        _length += 1
        true
      } else false
    } else if (_length == 1) {
      endTime = timestamp
      val ub = Swing.computeSlopeAndIntercept(
        startTime, firstValue, timestamp, value + maximumDeviation)
      upperBoundSlope = ub._1; upperBoundIntercept = ub._2
      val lb = Swing.computeSlopeAndIntercept(
        startTime, firstValue, timestamp, value - maximumDeviation)
      lowerBoundSlope = lb._1; lowerBoundIntercept = lb._2
      _length += 1
      true
    } else {
      val upperBoundApproximateValue = upperBoundSlope * timestamp + upperBoundIntercept
      val lowerBoundApproximateValue = lowerBoundSlope * timestamp + lowerBoundIntercept

      if (upperBoundApproximateValue + maximumDeviation < value ||
          lowerBoundApproximateValue - maximumDeviation > value) {
        false
      } else {
        endTime = timestamp

        if (upperBoundApproximateValue - maximumDeviation > value) {
          val ub = Swing.computeSlopeAndIntercept(
            startTime, firstValue, timestamp, value + maximumDeviation)
          upperBoundSlope = ub._1; upperBoundIntercept = ub._2
        }

        if (lowerBoundApproximateValue + maximumDeviation < value) {
          val lb = Swing.computeSlopeAndIntercept(
            startTime, firstValue, timestamp, value - maximumDeviation)
          lowerBoundSlope = lb._1; lowerBoundIntercept = lb._2
        }

        // Accumulate the numerator/denominator of the minimum-MSE slope.
        if (!Models.equalOrNan(firstValue, value)) {
          slopeWithMinimumMseNumerator += (value - firstValue) * (timestamp - startTime)
          slopeWithMinimumMseDenominator += math.pow((timestamp - startTime).toDouble, 2)
        }
        _length += 1
        true
      }
    }
  }

  def length: Int = _length

  /** One extra byte may be needed to store whether the line in/decreases. */
  def bytesPerValue: Float =
    (Models.CompressedMetadataSizeInBytes.toFloat + 1.0f) / _length

  /** The model: (firstValue, lastValue) of the fitted line, with the slope
    * clamped to [lowerBoundSlope, upperBoundSlope] around the min-MSE slope.
    */
  def model: (Float, Float) = {
    val projectedSlope = slopeWithMinimumMseNumerator / slopeWithMinimumMseDenominator
    // NaN-ignoring min/max (IEEE, like Rust f64::min/max): a 0/0 projected
    // slope must collapse to the bound slopes, not propagate NaN.
    val slopeWithMinimumMse =
      Models.fmaxD(lowerBoundSlope, Models.fminD(projectedSlope, upperBoundSlope))
    val lastValue = slopeWithMinimumMse * (endTime - startTime) + firstValue
    (firstValue.toFloat, lastValue.toFloat)
  }
}

object Swing {

  /** Slope/intercept of the line through (startTime, firstValue) and
    * (endTime, lastValue); constant line when the values are equal or NaN.
    */
  def computeSlopeAndIntercept(
      startTime: Long, firstValue: Double, endTime: Long, lastValue: Double): (Double, Double) = {
    if (Models.equalOrNan(firstValue, lastValue)) (0.0, firstValue)
    else {
      val slope = (lastValue - firstValue) / (endTime - startTime)
      val intercept = firstValue - slope * startTime
      (slope, intercept)
    }
  }

  /** Segment sum without gridding
    * (/root/reference/crates/modelardb_compression/src/models/swing.rs:264-300).
    */
  def sum(
      startTime: Long, endTime: Long, timestamps: Array[Byte],
      firstValue: Float, lastValue: Float, residualsLength: Int): Float = {
    val (slope, intercept) = computeSlopeAndIntercept(
      startTime, firstValue.toDouble, endTime, lastValue.toDouble)

    if (TimestampCodec.areCompressedTimestampsRegular(timestamps)) {
      val first = slope * startTime + intercept
      val last = slope * endTime + intercept
      val average = (first + last) / 2.0
      val length = Models.len(startTime, endTime, timestamps) - residualsLength
      (average * length).toFloat
    } else {
      val buf = new LongBuf(64)
      TimestampCodec.decompressAllTimestamps(startTime, endTime, timestamps, buf)
      val modelTimestampsEndIndex = buf.length - residualsLength
      var sum = 0.0
      var i = 0
      while (i < modelTimestampsEndIndex) {
        sum += slope * buf(i) + intercept
        i += 1
      }
      sum.toFloat
    }
  }

  /** Evaluate the line at `timestamps[from until until)` into `valueOut`. */
  def grid(
      startTime: Long, endTime: Long, firstValue: Float, lastValue: Float,
      timestamps: Array[Long], from: Int, until: Int, valueOut: FloatBuf): Unit = {
    val (slope, intercept) = computeSlopeAndIntercept(
      startTime, firstValue.toDouble, endTime, lastValue.toDouble)
    var i = from
    while (i < until) {
      valueOut.add((slope * timestamps(i) + intercept).toFloat)
      i += 1
    }
  }
}
