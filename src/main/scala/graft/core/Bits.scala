package graft.core

/** Bit-level reader over a byte array, most-significant bit first.
  *
  * Matches the bit layout of the reference codec
  * (/root/reference/crates/modelardb_compression/src/models/bits.rs:25-83).
  */
final class BitReader(bytes: Array[Byte]) {
  require(bytes.nonEmpty, "The bytes array must not be empty.")

  private var nextBit: Int = 0

  def isEmpty: Boolean = (nextBit / 8) == bytes.length

  def remainingBits: Int = 8 * bytes.length - nextBit

  def readBit(): Boolean = readBits(1) == 1L

  /** Read the next `numberOfBits` (<= 64) bits as an unsigned big-endian value. */
  def readBits(numberOfBits: Int): Long = {
    var value = 0L
    var bit = nextBit
    val endBit = nextBit + numberOfBits
    while (bit < endBit) {
      val byte = bytes(bit / 8)
      val shift = 7 - (bit % 8)
      value = (value << 1) | ((byte >> shift) & 1L)
      bit += 1
    }
    nextBit = endBit
    value
  }
}

/** Append bits to a growing byte array, most-significant bit first.
  *
  * Matches /root/reference/crates/modelardb_compression/src/models/bits.rs:86-174.
  */
final class BitVecBuilder {
  private var currentByte: Int = 0
  private var remainingBits: Int = 8
  private var bytes = new Array[Byte](16)
  private var count = 0

  private def push(b: Int): Unit = {
    if (count == bytes.length) bytes = java.util.Arrays.copyOf(bytes, bytes.length * 2)
    bytes(count) = b.toByte
    count += 1
  }

  def appendAZeroBit(): Unit = appendBits(0L, 1)
  def appendAOneBit(): Unit = appendBits(1L, 1)

  /** Append the `numberOfBits` least significant bits of `bits`. */
  def appendBits(bits: Long, numberOfBits: Int): Unit = {
    var n = numberOfBits
    while (n > 0) {
      val bitsWritten =
        if (n > remainingBits) {
          val shift = n - remainingBits
          currentByte |= (((bits >>> shift) & ((1L << remainingBits) - 1)).toInt)
          remainingBits
        } else {
          val shift = remainingBits - n
          val mask = (0xff >>> (8 - remainingBits)).toLong
          currentByte |= (((bits << shift) & mask).toInt)
          n
        }
      n -= bitsWritten
      remainingBits -= bitsWritten
      if (remainingBits == 0) {
        push(currentByte)
        currentByte = 0
        remainingBits = 8
      }
    }
  }

  def isEmpty: Boolean = count == 0 && remainingBits == 8

  def finish(): Array[Byte] = {
    if (remainingBits != 8) {
      push(currentByte)
      currentByte = 0
      remainingBits = 8
    }
    java.util.Arrays.copyOf(bytes, count)
  }

  /** Pad the trailing partial byte with one bits, then finish. The reader uses
    * the all-ones padding as an end-of-stream marker.
    */
  def finishWithOneBits(): Array[Byte] = {
    if (remainingBits != 8) {
      val remainingBitsToSet = (1 << remainingBits) - 1
      appendBits(remainingBitsToSet.toLong, remainingBits)
    }
    finish()
  }
}
