package graft.core

import scala.collection.mutable.ArrayBuffer

/** Greedy model-based compression of a sorted univariate time series into
  * segments: PMC-Mean and Swing are fitted in parallel; whichever covers the
  * next sub-sequence with the fewest bytes per value wins, if it beats
  * storing raw 4-byte floats. Values no model covers efficiently become
  * Gorilla (MacaqueV) residuals — at most 255 attached to the previous
  * model's segment, longer runs become their own MacaqueV segment.
  *
  * Port of /root/reference/crates/modelardb_compression/src/compression.rs:191-400
  * and types.rs:40-145 (ModelBuilder) / types.rs:148-407 (segment builder).
  */
object Compressor {

  /** Max residual values attachable to a segment (count fits in one byte). */
  val ResidualValuesMaxLength: Int = 255

  /** A fitted model covering `[startIndex, endIndex]` of the input. */
  private final class FittedModel(
      val modelTypeId: Byte,
      val startIndex: Int,
      val endIndex: Int,
      var minValue: Float,
      var maxValue: Float,
      var values: Array[Byte],
      val modelLastValue: Float,
      val bytesPerValue: Float)

  /** Fit PMC-Mean and Swing in lockstep starting at `startIndex`; return the
    * cheaper fitted model once neither can be extended.
    */
  private def fitNextModel(
      startIndex: Int, errorBound: ErrorBound,
      timestamps: Array[Long], values: Array[Float]): FittedModel = {
    val pmcMean = new PmcMean(errorBound)
    val swing = new Swing(errorBound)
    var pmcMeanCouldFitAll = true
    var swingCouldFitAll = true

    var i = startIndex
    val endIndex = timestamps.length
    var canFitMore = true
    while (canFitMore && i < endIndex) {
      val t = timestamps(i)
      val v = values(i)
      pmcMeanCouldFitAll = pmcMeanCouldFitAll && pmcMean.fitValue(v)
      swingCouldFitAll = swingCouldFitAll && swing.fitDataPoint(t, v)
      canFitMore = pmcMeanCouldFitAll || swingCouldFitAll
      i += 1
    }

    if (pmcMean.bytesPerValue <= swing.bytesPerValue) {
      val value = pmcMean.model
      new FittedModel(Models.PmcMeanId, startIndex, startIndex + pmcMean.length - 1,
        value, value, Array.emptyByteArray, value, pmcMean.bytesPerValue)
    } else {
      val (firstValue, lastValue) = swing.model
      val minValue = Models.fmin(firstValue, lastValue)
      val maxValue = Models.fmax(firstValue, lastValue)
      // An empty values array means minValue is the first value; a single
      // zero byte means the line decreases (maxValue first).
      val swingValues =
        if (firstValue < lastValue) Array.emptyByteArray else Array[Byte](0)
      new FittedModel(Models.SwingId, startIndex, startIndex + swing.length - 1,
        minValue, maxValue, swingValues, lastValue, swing.bytesPerValue)
    }
  }

  /** Compress a sorted univariate series into segments. */
  def compressUnivariate(
      timestamps: Array[Long], values: Array[Float],
      errorBound: ErrorBound): IndexedSeq[Segment] = {
    require(timestamps.length == values.length,
      "Timestamps and values must have the same length.")
    val out = new ArrayBuffer[Segment]()
    if (timestamps.isEmpty) return out.toIndexedSeq

    val endIndex = timestamps.length
    var currentStartIndex = 0
    var previousModel: FittedModel = null

    while (currentStartIndex < endIndex) {
      val model = fitNextModel(currentStartIndex, errorBound, timestamps, values)

      // Keep the model only if it beats storing the raw 4-byte values.
      if (model.bytesPerValue <= Models.ValueSizeInBytes.toFloat) {
        if (currentStartIndex > 0) {
          storeSegmentsWithModelAndOrResiduals(
            errorBound, previousModel, currentStartIndex - 1, timestamps, values, out)
        }
        currentStartIndex = model.endIndex + 1
        previousModel = model
      } else {
        // No efficient model: this value becomes a residual.
        currentStartIndex += 1
      }
    }

    storeSegmentsWithModelAndOrResiduals(
      errorBound, previousModel, endIndex - 1, timestamps, values, out)
    out.toIndexedSeq
  }

  private def storeSegmentsWithModelAndOrResiduals(
      errorBound: ErrorBound, maybeModel: FittedModel, residualsEndIndex: Int,
      timestamps: Array[Long], values: Array[Float],
      out: ArrayBuffer[Segment]): Unit = {
    if (maybeModel != null) {
      val model = maybeModel
      // A model with NaN parameters (an all-NaN run accepted under the
      // lossless bound's equal-or-NaN rule) must not absorb residuals:
      // the min/max re-encoding relies on orderings NaN breaks, and the
      // residual XOR chain would seed from a misdecoded last value.
      val nanParams = model.minValue.isNaN || model.maxValue.isNaN
      if (!nanParams && residualsEndIndex - model.endIndex <= ResidualValuesMaxLength) {
        out += finishSegment(errorBound, model, residualsEndIndex, timestamps, values)
      } else {
        out += finishSegment(errorBound, model, model.endIndex, timestamps, values)
        if (residualsEndIndex > model.endIndex) {
          out += compressResidualsAsSeparateSegment(
            errorBound, model.endIndex + 1, residualsEndIndex, timestamps, values)
        }
      }
    } else {
      out += compressResidualsAsSeparateSegment(
        errorBound, 0, residualsEndIndex, timestamps, values)
    }
  }

  /** Build a segment from `model` plus residuals up to `residualsEndIndex`
    * inclusive. With residuals present, the model's min/max may be
    * overwritten in segment metadata, so the model parameters are re-encoded
    * (/root/reference/crates/modelardb_compression/src/types.rs:197-267).
    */
  private def finishSegment(
      errorBound: ErrorBound, model: FittedModel, residualsEndIndex: Int,
      timestamps: Array[Long], values: Array[Float]): Segment = {
    val startTime = timestamps(model.startIndex)
    val endTime = timestamps(residualsEndIndex)
    val compressedTimestamps = TimestampCodec.compressResidualTimestamps(
      timestamps, model.startIndex, residualsEndIndex + 1)

    var minValue = model.minValue
    var maxValue = model.maxValue
    var modelValues = model.values
    var residuals = Array.emptyByteArray

    if (model.endIndex < residualsEndIndex) {
      val residualsStartIndex = model.endIndex + 1
      val macaqueV = new MacaqueV(errorBound)
      macaqueV.compressValuesWithoutFirst(
        values, residualsStartIndex, residualsEndIndex + 1, model.modelLastValue)
      val (residualBytes, residualsMinValue, residualsMaxValue) = macaqueV.model

      modelValues = (model.modelTypeId: Int) match {
        case 0 => encodeValuesForPmcMean(
          model.minValue, model.maxValue, residualsMinValue, residualsMaxValue)
        case 1 => encodeValuesForSwing(
          model.minValue, model.maxValue, model.values.isEmpty,
          residualsMinValue, residualsMaxValue)
        case other => throw new IllegalArgumentException(s"Unknown model type $other.")
      }

      minValue = Models.fmin(model.minValue, residualsMinValue)
      maxValue = Models.fmax(model.maxValue, residualsMaxValue)

      val count = residualsEndIndex - residualsStartIndex + 1
      residuals = java.util.Arrays.copyOf(residualBytes, residualBytes.length + 1)
      residuals(residualBytes.length) = count.toByte
    }

    Segment(model.modelTypeId, startTime, endTime, compressedTimestamps,
      minValue, maxValue, modelValues, residuals, Float.NaN)
  }

  /** Compress `[startIndex, endIndex]` as a standalone MacaqueV segment. */
  private def compressResidualsAsSeparateSegment(
      errorBound: ErrorBound, startIndex: Int, endIndex: Int,
      timestamps: Array[Long], values: Array[Float]): Segment = {
    val startTime = timestamps(startIndex)
    val endTime = timestamps(endIndex)
    val compressedTimestamps =
      TimestampCodec.compressResidualTimestamps(timestamps, startIndex, endIndex + 1)

    val macaqueV = new MacaqueV(errorBound)
    macaqueV.compressValues(values, startIndex, endIndex + 1)
    val (bytes, minValue, maxValue) = macaqueV.model

    Segment(Models.MacaqueVId, startTime, endTime, compressedTimestamps,
      minValue, maxValue, bytes, Array.emptyByteArray, Float.NaN)
  }

  /** PMC-Mean parameter re-encoding when residual min/max overwrite the
    * model's (/root/reference/crates/modelardb_compression/src/types.rs:283-303).
    */
  private[core] def encodeValuesForPmcMean(
      minValue: Float, maxValue: Float,
      residualsMinValue: Float, residualsMaxValue: Float): Array[Byte] = {
    if (minValue > residualsMinValue) {
      if (maxValue >= residualsMaxValue) Array[Byte](1)
      else Models.leBytes(minValue)
    } else Array.emptyByteArray
  }

  /** Swing parameter re-encoding when residual min/max overwrite the model's
    * (/root/reference/crates/modelardb_compression/src/types.rs:325-370).
    */
  private[core] def encodeValuesForSwing(
      minValue: Float, maxValue: Float, minValueIsFirst: Boolean,
      residualsMinValue: Float, residualsMaxValue: Float): Array[Byte] = {
    if (residualsMinValue < minValue && maxValue < residualsMaxValue) {
      val first = if (minValueIsFirst) minValue else maxValue
      val last = if (minValueIsFirst) maxValue else minValue
      Models.leBytes(first) ++ Models.leBytes(last)
    } else if (residualsMinValue < minValue) {
      val flag: Byte = if (minValueIsFirst) 0 else 1
      flag +: Models.leBytes(minValue)
    } else if (maxValue < residualsMaxValue) {
      val flag: Byte = if (minValueIsFirst) 2 else 3
      flag +: Models.leBytes(maxValue)
    } else if (!minValueIsFirst) {
      Array[Byte](0)
    } else Array.emptyByteArray
  }
}
