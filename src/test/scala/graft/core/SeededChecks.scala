package graft.core

import scala.util.Random

/** Deterministic property-style checks: the scalatest/scalacheck bridge
  * artifact is not in the offline cache, so properties run as seeded loops.
  */
trait SeededChecks {
  def checkAll(iterations: Int = 100, seed: Long = 42L)(body: Random => Unit): Unit = {
    val rng = new Random(seed)
    var i = 0
    while (i < iterations) {
      body(rng)
      i += 1
    }
  }

  def randomFloatAny(rng: Random): Float = rng.nextInt(20) match {
    case 0 => Float.NaN
    case 1 => Float.PositiveInfinity
    case 2 => Float.NegativeInfinity
    case 3 => 0.0f
    case 4 => -0.0f
    case 5 => java.lang.Float.intBitsToFloat(rng.nextInt()) // any bit pattern
    case _ => (rng.nextFloat() * 2 - 1) * 1e6f
  }

  def randomFloats(rng: Random, maxLen: Int = 50)(gen: Random => Float): Array[Float] =
    Array.fill(1 + rng.nextInt(maxLen))(gen(rng))
}
