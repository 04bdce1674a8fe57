package graft.core

/** Lossless timestamp codec for compressed segments ("MacaqueTS" in the
  * reference). A segment stores its first/last timestamp as `start_time` /
  * `end_time`; the residual timestamps are either the segment length with
  * prefix zero bytes stripped (regular sampling interval, flag bit 0) or
  * delta-of-deltas in a variable-length binary encoding (irregular, flag
  * bit 1).
  *
  * Port of /root/reference/crates/modelardb_compression/src/models/timestamps.rs:56-292.
  */
object TimestampCodec {

  /** Compress `timestamps[from until until)`; empty result for <= 2 points. */
  def compressResidualTimestamps(
      timestamps: Array[Long], from: Int, until: Int): Array[Byte] = {
    val n = until - from
    if (n <= 2) return Array.emptyByteArray
    if (areUncompressedTimestampsRegular(timestamps, from, until))
      compressRegular(n)
    else
      compressIrregular(timestamps, from, until)
  }

  def compressResidualTimestamps(timestamps: Array[Long]): Array[Byte] =
    compressResidualTimestamps(timestamps, 0, timestamps.length)

  def areUncompressedTimestampsRegular(
      timestamps: Array[Long], from: Int, until: Int): Boolean = {
    if (until - from < 2) return true
    val expectedInterval = timestamps(from + 1) - timestamps(from)
    var i = from + 1
    while (i < until) {
      if (timestamps(i) - timestamps(i - 1) != expectedInterval) return false
      i += 1
    }
    true
  }

  /** Segment length big-endian with all prefix zero bytes stripped; one extra
    * bit is reserved so the first stored bit (the regular/irregular flag) is
    * always zero.
    */
  private def compressRegular(length: Int): Array[Byte] = {
    val lengthAsLong = length.toLong
    val leadingZeroBits = java.lang.Long.numberOfLeadingZeros(lengthAsLong)
    val numberOfBitsToWrite = (64 - leadingZeroBits) + 1
    val numberOfBytesToWrite = math.ceil(numberOfBitsToWrite / 8.0).toInt
    val out = new Array[Byte](numberOfBytesToWrite)
    var i = 0
    while (i < numberOfBytesToWrite) {
      val shift = 8 * (numberOfBytesToWrite - 1 - i)
      out(i) = ((lengthAsLong >>> shift) & 0xff).toByte
      i += 1
    }
    out
  }

  private def compressIrregular(
      timestamps: Array[Long], from: Int, until: Int): Array[Byte] = {
    val out = new BitVecBuilder()
    out.appendAOneBit()

    var lastTimestamp = timestamps(from)
    var lastDelta = 0L
    var i = from + 1
    while (i < until - 1) {
      val timestamp = timestamps(i)
      val delta = timestamp - lastTimestamp
      val deltaOfDelta = delta - lastDelta

      if (deltaOfDelta == 0L) out.appendAZeroBit()
      else if (deltaOfDelta >= -63L && deltaOfDelta <= 64L) {
        out.appendBits(0x2L, 2)
        out.appendBits(deltaOfDelta, 7)
      } else if (deltaOfDelta >= -255L && deltaOfDelta <= 256L) {
        out.appendBits(0x6L, 3)
        out.appendBits(deltaOfDelta, 9)
      } else if (deltaOfDelta >= -2047L && deltaOfDelta <= 2048L) {
        out.appendBits(0xeL, 4)
        out.appendBits(deltaOfDelta, 12)
      } else if (deltaOfDelta >= -2147483647L && deltaOfDelta <= 2147483648L) {
        out.appendBits(0x1eL, 5)
        out.appendBits(deltaOfDelta, 32)
      } else {
        out.appendBits(0x1fL, 5)
        out.appendBits(deltaOfDelta, 64)
      }
      lastDelta = delta
      lastTimestamp = timestamp
      i += 1
    }
    out.finishWithOneBits()
  }

  /** Flag bit zero (or no residual bytes) means a regular sampling interval. */
  def areCompressedTimestampsRegular(residualTimestamps: Array[Byte]): Boolean =
    residualTimestamps.isEmpty || (residualTimestamps(0) & 0x80) == 0

  /** Decode the stored segment length of a regular segment. */
  def decodeRegularLength(residualTimestamps: Array[Byte]): Int = {
    var length = 0L
    var i = 0
    while (i < residualTimestamps.length) {
      length = (length << 8) | (residualTimestamps(i) & 0xffL)
      i += 1
    }
    length.toInt
  }

  /** Decompress all of a segment's timestamps into `out`. */
  def decompressAllTimestamps(
      startTime: Long, endTime: Long, residualTimestamps: Array[Byte],
      out: LongBuf): Unit = {
    if (residualTimestamps.isEmpty && startTime == endTime) {
      out.add(startTime)
    } else if (residualTimestamps.isEmpty) {
      out.add(startTime)
      out.add(endTime)
    } else if (areCompressedTimestampsRegular(residualTimestamps)) {
      // Count-based decode: also handles a run of identical timestamps
      // (interval 0), where a bound-based loop would never terminate (the
      // reference panics on that input, models/timestamps.rs:219-222).
      val length = decodeRegularLength(residualTimestamps)
      val samplingInterval = (endTime - startTime) / (length - 1)
      var i = 0
      while (i < length) {
        out.add(startTime + i * samplingInterval)
        i += 1
      }
    } else {
      decompressIrregular(startTime, endTime, residualTimestamps, out)
    }
  }

  private def decompressIrregular(
      startTime: Long, endTime: Long, residualTimestamps: Array[Byte],
      out: LongBuf): Unit = {
    out.add(startTime)

    val bits = new BitReader(residualTimestamps)
    bits.readBit() // Skip the irregular flag bit.

    var lastDelta = 0L
    var timestamp = startTime
    var done = false
    while (!done && !bits.isEmpty) {
      // Read the next flag: 0, 10, 110, 1110, 11110, or 11111.
      var leadingOneBits = 0
      while (leadingOneBits < 5 && !bits.isEmpty && bits.readBit()) {
        leadingOneBits += 1
      }

      // Padding is all one bits, so a run of ones followed by fewer bits than
      // the smallest encoding means all residual timestamps are decoded.
      if (leadingOneBits != 0 && bits.remainingBits < 7) {
        done = true
      } else {
        val delta = leadingOneBits match {
          case 0 => lastDelta
          case 1 => readDecodeAndComputeDelta(bits, 7, lastDelta)
          case 2 => readDecodeAndComputeDelta(bits, 9, lastDelta)
          case 3 => readDecodeAndComputeDelta(bits, 12, lastDelta)
          case 4 => readDecodeAndComputeDelta(bits, 32, lastDelta)
          case 5 => readDecodeAndComputeDelta(bits, 64, lastDelta)
        }
        timestamp += delta
        out.add(timestamp)
        lastDelta = delta
      }
    }
    out.add(endTime)
  }

  /** Read a delta-of-delta of `bitsToRead` bits, sign-extend, add to `lastDelta`. */
  private def readDecodeAndComputeDelta(
      bits: BitReader, bitsToRead: Int, lastDelta: Long): Long = {
    val encoded = bits.readBits(bitsToRead)
    val deltaOfDelta =
      if (bitsToRead == 64) encoded
      else if (java.lang.Long.compareUnsigned(encoded, 1L << (bitsToRead - 1)) > 0)
        encoded | (-1L << bitsToRead)
      else encoded
    lastDelta + deltaOfDelta
  }

  /** Number of data points in a segment without materializing timestamps
    * (/root/reference/crates/modelardb_compression/src/models/mod.rs:98-124).
    */
  def len(startTime: Long, endTime: Long, timestamps: Array[Byte]): Int = {
    if (timestamps.isEmpty && startTime == endTime) 1
    else if (timestamps.isEmpty) 2
    else if (areCompressedTimestampsRegular(timestamps)) {
      decodeRegularLength(timestamps)
    } else {
      val buf = new LongBuf(64)
      decompressAllTimestamps(startTime, endTime, timestamps, buf)
      buf.length
    }
  }

  /** (max consecutive timestamp delta, count of deltas > thresholdUs) over
    * one segment — the intra-segment half of gap detection. Values never
    * decode, and REGULAR segments answer in O(1) from the stored length
    * (every delta is the sampling interval); only irregular segments pay a
    * timestamp-only decode. A single-point segment has no deltas: maxDelta
    * is returned as -1 (the expression layer surfaces it as NULL).
    */
  def timeGapStats(startTime: Long, endTime: Long, timestamps: Array[Byte],
      thresholdUs: Long): Array[Long] = {
    if (timestamps.isEmpty && startTime == endTime) {
      Array(-1L, 0L)
    } else if (timestamps.isEmpty) {
      val d = endTime - startTime
      Array(d, if (d > thresholdUs) 1L else 0L)
    } else if (areCompressedTimestampsRegular(timestamps)) {
      val n = decodeRegularLength(timestamps)
      val interval = (endTime - startTime) / (n - 1)
      Array(interval, if (interval > thresholdUs) (n - 1).toLong else 0L)
    } else {
      val buf = new LongBuf(64)
      decompressAllTimestamps(startTime, endTime, timestamps, buf)
      val b = buf.backing
      var mx = -1L
      var over = 0L
      var i = 1
      while (i < buf.length) {
        val d = b(i) - b(i - 1)
        if (d > mx) mx = d
        if (d > thresholdUs) over += 1
        i += 1
      }
      Array(mx, over)
    }
  }
}
