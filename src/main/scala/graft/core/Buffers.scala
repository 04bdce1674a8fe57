package graft.core

/** Minimal growable primitive buffers used by the compression kernel to avoid
  * boxing in hot loops (the kernel runs per-partition inside Spark tasks).
  */
final class LongBuf(initialCapacity: Int = 16) {
  private var arr = new Array[Long](math.max(initialCapacity, 4))
  private var count = 0

  def add(v: Long): Unit = {
    if (count == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(count) = v
    count += 1
  }

  def length: Int = count
  def apply(i: Int): Long = arr(i)
  def last: Long = arr(count - 1)

  /** Copy of the valid prefix. */
  def toArray: Array[Long] = java.util.Arrays.copyOf(arr, count)

  /** Direct view of the backing array; only indices < length are valid. */
  def backing: Array[Long] = arr

  /** Reset to empty, keeping the grown capacity (per-run buffer reuse). */
  def clear(): Unit = count = 0
}

final class FloatBuf(initialCapacity: Int = 16) {
  private var arr = new Array[Float](math.max(initialCapacity, 4))
  private var count = 0

  def add(v: Float): Unit = {
    if (count == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(count) = v
    count += 1
  }

  def length: Int = count
  def apply(i: Int): Float = arr(i)
  def last: Float = arr(count - 1)
  def toArray: Array[Float] = java.util.Arrays.copyOf(arr, count)
  def backing: Array[Float] = arr

  /** Reset to empty, keeping the grown capacity (per-run buffer reuse). */
  def clear(): Unit = count = 0
}
