package graft.core

/** PMC-Mean: constant model keeping a running mean while every fitted value's
  * min/max stays within the error bound of the mean.
  *
  * Port of /root/reference/crates/modelardb_compression/src/models/pmc_mean.rs:31-108.
  */
final class PmcMean(errorBound: ErrorBound) {
  private var minValue: Float = Float.NaN
  private var maxValue: Float = Float.NaN
  private var sumOfValues: Double = 0.0
  private var _length: Int = 0

  /** Try to extend the model with `value`; true iff it still fits. */
  def fitValue(value: Float): Boolean = {
    val nextMinValue = Models.fmin(minValue, value)
    val nextMaxValue = Models.fmax(maxValue, value)
    val nextSumOfValues = sumOfValues + value
    val nextLength = _length + 1
    val average = (nextSumOfValues / nextLength).toFloat
    if (Models.isValueWithinErrorBound(errorBound, nextMinValue, average) &&
        Models.isValueWithinErrorBound(errorBound, nextMaxValue, average)) {
      minValue = nextMinValue
      maxValue = nextMaxValue
      sumOfValues = nextSumOfValues
      _length = nextLength
      true
    } else false
  }

  def length: Int = _length

  /** Average bytes per value; the mean rides along in segment metadata. */
  def bytesPerValue: Float = Models.CompressedMetadataSizeInBytes.toFloat / _length

  /** The model coefficient: the mean of the fitted values. */
  def model: Float = (sumOfValues / _length).toFloat
}

object PmcMean {
  def sum(modelLength: Int, value: Float): Float = modelLength * value
}
