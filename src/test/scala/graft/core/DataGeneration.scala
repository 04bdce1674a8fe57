package graft.core

import scala.util.Random

/** Deterministic synthetic series generator mirroring the reference's test
  * data strategy (/root/reference/crates/modelardb_test/src/data_generation.rs:69-284):
  * regular or irregular timestamps; values composed of constant / linear /
  * random runs so every model type is exercised.
  */
object DataGeneration {
  sealed trait ValuesStructure
  case object Constant extends ValuesStructure
  case object Linear extends ValuesStructure
  final case class RandomValues(min: Float, max: Float) extends ValuesStructure

  def generateTimestamps(length: Int, irregular: Boolean, rng: Random): Array[Long] = {
    val out = new Array[Long](length)
    var t = 0L
    var i = 0
    while (i < length) {
      t += (if (irregular) 100 + rng.nextInt(100) else 100)
      out(i) = t
      i += 1
    }
    out
  }

  def generateValues(
      length: Int, structure: ValuesStructure, noise: Option[Float],
      rng: Random): Array[Float] = {
    val out = new Array[Float](length)
    structure match {
      case Constant =>
        val v = -100.0f + rng.nextFloat() * 200.0f
        var i = 0
        while (i < length) {
          out(i) = v + noise.map(n => (rng.nextFloat() * 2 - 1) * n).getOrElse(0.0f)
          i += 1
        }
      case Linear =>
        var slope = 0.0f
        while (slope == 0.0f) slope = -10.0f + rng.nextFloat() * 20.0f
        val intercept = 1.0f + rng.nextFloat() * 49.0f
        var i = 0
        while (i < length) {
          out(i) = slope * i + intercept +
            noise.map(n => (rng.nextFloat() * 2 - 1) * n).getOrElse(0.0f)
          i += 1
        }
      case RandomValues(min, max) =>
        var i = 0
        while (i < length) {
          out(i) = min + rng.nextFloat() * (max - min)
          i += 1
        }
    }
    out
  }

  /** Series of 50-100-point runs alternating the three structures. */
  def generateMixedSeries(
      totalLength: Int, irregular: Boolean, noise: Option[Float],
      seed: Long = 42L): (Array[Long], Array[Float]) = {
    val rng = new Random(seed)
    val timestamps = generateTimestamps(totalLength, irregular, rng)
    val values = new FloatBuf(totalLength)
    val structures: Array[ValuesStructure] =
      Array(Constant, Linear, RandomValues(-50.0f, 50.0f))
    var remaining = totalLength
    var k = 0
    while (remaining > 0) {
      val runLength = math.min(remaining, 50 + rng.nextInt(51))
      val run = generateValues(runLength, structures(k % 3), noise, rng)
      run.foreach(values.add)
      remaining -= runLength
      k += 1
    }
    (timestamps, values.toArray)
  }
}
