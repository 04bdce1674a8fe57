package graft.core

/** MacaqueV: Gorilla-style XOR float compression with swapped flag bits
  * (repeat = `10`, reuse-window = `0`, new-window = `11`) and optional lossy
  * value rewriting within the error bound (replace with previous value, or
  * zero the least significant mantissa bits).
  *
  * Port of /root/reference/crates/modelardb_compression/src/models/macaque_v.rs:39-336.
  */
final class MacaqueV(errorBound: ErrorBound) {
  private var minValue: Float = Float.NaN
  private var maxValue: Float = Float.NaN
  private var lastValue: Float = 0.0f
  private var lastLeadingZeroBits: Int = 255
  private var lastTrailingZeroBits: Int = 0
  private val compressedValues = new BitVecBuilder()
  private var _length: Int = 0

  def length: Int = _length

  /** Store the first value in full, then XOR-compress the rest. */
  def compressValues(values: Array[Float], from: Int, until: Int): Unit = {
    var i = from
    while (i < until) {
      val value = values(i)
      if (compressedValues.isEmpty) {
        compressedValues.appendBits(
          java.lang.Float.floatToRawIntBits(value).toLong & 0xffffffffL,
          Models.ValueSizeInBits)
        updateMinMaxAndLastValue(value)
      } else {
        compressValueXorLastValue(value)
      }
      i += 1
    }
  }

  def compressValues(values: Array[Float]): Unit =
    compressValues(values, 0, values.length)

  /** The first value is XOR-compressed against `modelLastValue`, which is
    * stored elsewhere (the preceding model's last value).
    */
  def compressValuesWithoutFirst(
      values: Array[Float], from: Int, until: Int, modelLastValue: Float): Unit = {
    lastValue = modelLastValue
    var i = from
    while (i < until) {
      compressValueXorLastValue(values(i))
      i += 1
    }
  }

  private def compressValueXorLastValue(value0: Float): Unit = {
    val value = errorBound match {
      case ErrorBound.Lossless => value0
      case _ =>
        // Best case: rewrite the value with the previous one within bound.
        if (Models.isValueWithinErrorBound(errorBound, value0, lastValue)) lastValue
        else rewriteLeastMantissaBits(value0)
    }

    val valueAsInteger = java.lang.Float.floatToRawIntBits(value)
    val lastValueAsInteger = java.lang.Float.floatToRawIntBits(lastValue)
    val valueXorLastValue = valueAsInteger ^ lastValueAsInteger

    if (valueXorLastValue == 0) {
      // A repeated value is a one bit followed by a zero bit.
      compressedValues.appendAOneBit()
      compressedValues.appendAZeroBit()
    } else {
      val leadingZeroBits = Integer.numberOfLeadingZeros(valueXorLastValue)
      val trailingZeroBits = Integer.numberOfTrailingZeros(valueXorLastValue)

      if (leadingZeroBits >= lastLeadingZeroBits &&
          trailingZeroBits >= lastTrailingZeroBits) {
        // Flag zero bit, then the meaningful bits in the previous window.
        compressedValues.appendAZeroBit()
        val meaningfulBits =
          Models.ValueSizeInBits - lastLeadingZeroBits - lastTrailingZeroBits
        compressedValues.appendBits(
          ((valueXorLastValue >>> lastTrailingZeroBits).toLong & 0xffffffffL),
          meaningfulBits)
      } else {
        // Flags one-one, 5 bits of leading zeros, 6 bits of meaningful length.
        compressedValues.appendAOneBit()
        compressedValues.appendAOneBit()
        compressedValues.appendBits(leadingZeroBits.toLong, 5)
        val meaningfulBits = Models.ValueSizeInBits - leadingZeroBits - trailingZeroBits
        compressedValues.appendBits(meaningfulBits.toLong, 6)
        compressedValues.appendBits(
          ((valueXorLastValue >>> trailingZeroBits).toLong & 0xffffffffL),
          meaningfulBits)
        lastLeadingZeroBits = leadingZeroBits
        lastTrailingZeroBits = trailingZeroBits
      }
    }

    updateMinMaxAndLastValue(value)
  }

  /** Zero as many least significant mantissa bits as the error bound allows. */
  private def rewriteLeastMantissaBits(value: Float): Float = {
    if (math.abs(value) == 0.0f || value.isNaN || value.isInfinite) return value

    val valueBits = java.lang.Float.floatToRawIntBits(value)
    val absErrorBound =
      Models.maximumAllowedDeviation(errorBound, value.toDouble).toFloat
    val exponent = MacaqueV.getExponent(value)
    val factorizedEpsilon = absErrorBound / math.pow(2.0, exponent).toFloat
    // Rewriting 23 - floor(|log2 eps|) bits, with a fallback of one fewer bit
    // if the floor-based rewrite exceeds the bound.
    val log2Abs = math.abs(math.log(factorizedEpsilon.toDouble) / math.log(2.0))
    var rewritePosition = 23 - math.floor(log2Abs).toInt
    var rewrittenValue =
      java.lang.Float.intBitsToFloat(MacaqueV.rewriteBitsByN(valueBits, rewritePosition))

    if (!Models.isValueWithinErrorBound(errorBound, value, rewrittenValue)) {
      rewritePosition -= 1
      rewrittenValue =
        java.lang.Float.intBitsToFloat(MacaqueV.rewriteBitsByN(valueBits, rewritePosition))
      if (!Models.isValueWithinErrorBound(errorBound, value, rewrittenValue)) {
        // Guard against pathological bounds where no rewrite is possible.
        rewrittenValue = value
      }
    }
    rewrittenValue
  }

  private def updateMinMaxAndLastValue(value: Float): Unit = {
    minValue = Models.fmin(minValue, value)
    maxValue = Models.fmax(maxValue, value)
    lastValue = value
    _length += 1
  }

  /** (compressed bytes, min value, max value). */
  def model: (Array[Byte], Float, Float) =
    (compressedValues.finish(), minValue, maxValue)
}

object MacaqueV {

  /** Stateful XOR decoder used by both sum and grid (allocation-free per
    * value; decoding is the query-path hot loop).
    */
  private final class Decoder(bits: BitReader) {
    private var leadingZeros = 255
    private var trailingZeros = 0
    var lastValue: Int = 0

    /** Decode the next value into `lastValue`. */
    def next(): Unit = {
      if (bits.readBit()) {
        if (bits.readBit()) {
          // Flag 11: new leading/trailing zero window, then meaningful bits.
          leadingZeros = bits.readBits(5).toInt
          val meaningfulBitsStored = bits.readBits(6).toInt
          trailingZeros = Models.ValueSizeInBits - meaningfulBitsStored - leadingZeros
          val meaningfulBits = Models.ValueSizeInBits - leadingZeros - trailingZeros
          var v = bits.readBits(meaningfulBits).toInt
          v <<= trailingZeros
          lastValue = v ^ lastValue
        }
        // Flag 10: repeat of the previous value; nothing to read.
      } else {
        // Flag 0: meaningful bits in the previous window.
        val meaningfulBits = Models.ValueSizeInBits - leadingZeros - trailingZeros
        var v = bits.readBits(meaningfulBits).toInt
        v <<= trailingZeros
        lastValue = v ^ lastValue
      }
    }
  }

  /** Decode-and-sum `length` values; mirrors `grid` without materializing. */
  def sum(
      length: Int, values: Array[Byte],
      hasModelLastValue: Boolean, modelLastValue: Float): Float = {
    val bits = new BitReader(values)
    val d = new Decoder(bits)
    var sum = 0.0f
    if (hasModelLastValue) {
      d.lastValue = java.lang.Float.floatToRawIntBits(modelLastValue)
    } else {
      d.lastValue = bits.readBits(Models.ValueSizeInBits).toInt
      sum = java.lang.Float.intBitsToFloat(d.lastValue)
    }
    val toRead = if (hasModelLastValue) length else length - 1
    var i = 0
    while (i < toRead) {
      d.next()
      sum += java.lang.Float.intBitsToFloat(d.lastValue)
      i += 1
    }
    sum
  }

  /** Decode `count` values into `valueOut`. */
  def grid(
      values: Array[Byte], count: Int, valueOut: FloatBuf,
      hasModelLastValue: Boolean, modelLastValue: Float): Unit = {
    val bits = new BitReader(values)
    val d = new Decoder(bits)
    if (hasModelLastValue) {
      d.lastValue = java.lang.Float.floatToRawIntBits(modelLastValue)
    } else {
      d.lastValue = bits.readBits(Models.ValueSizeInBits).toInt
      valueOut.add(java.lang.Float.intBitsToFloat(d.lastValue))
    }
    val toRead = if (hasModelLastValue) count else count - 1
    var i = 0
    while (i < toRead) {
      d.next()
      valueOut.add(java.lang.Float.intBitsToFloat(d.lastValue))
      i += 1
    }
  }

  /** Unbiased IEEE-754 exponent of `value`. */
  def getExponent(value: Float): Int = {
    val nBits = java.lang.Float.floatToRawIntBits(value)
    ((nBits >>> 23) & 0xff) - 127
  }

  /** Zero the `positionsToShift` least significant bits. */
  def rewriteBitsByN(bitsToRewrite: Int, positionsToShift: Int): Int = {
    if (positionsToShift <= 0) bitsToRewrite
    else if (positionsToShift >= 32) 0
    else bitsToRewrite & (-1 << positionsToShift)
  }
}
