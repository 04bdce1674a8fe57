package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class TimestampCodecSpec extends AnyFunSuite with SeededChecks {

  private def roundTrip(timestamps: Array[Long], knownSize: Option[Int] = None): Unit = {
    val compressed = TimestampCodec.compressResidualTimestamps(timestamps)
    if (timestamps.length <= 2) assert(compressed.isEmpty)
    else assert(compressed.nonEmpty)
    knownSize.foreach(size => assert(compressed.length == size))

    val out = new LongBuf()
    TimestampCodec.decompressAllTimestamps(
      timestamps.head, timestamps.last, compressed, out)
    assert(out.toArray.toSeq == timestamps.toSeq)
    assert(TimestampCodec.len(timestamps.head, timestamps.last, compressed)
      == timestamps.length)
  }

  test("zero, one, or two timestamps compress to nothing") {
    assert(TimestampCodec.compressResidualTimestamps(Array[Long](100)).isEmpty)
    assert(TimestampCodec.compressResidualTimestamps(Array[Long](100, 300)).isEmpty)
  }

  test("regular series compresses to stripped length") {
    roundTrip(Array(1579701905500L, 1579701905600L, 1579701905700L,
      1579701905800L, 1579701905900L), Some(1))
  }

  test("irregular series uses delta-of-delta encoding") {
    roundTrip(Array(1579694400057L, 1579694400197L, 1579694400353L,
      1579694400493L, 1579694400650L), Some(4))
  }

  test("irregular bucket sizes 7, 9, 12, 32 bits") {
    roundTrip(Array(100L, 37L, 38L, 200L), Some(3))
    roundTrip(Array(500L, 245L, 246L, 500L), Some(4))
    roundTrip(Array(5000L, 2953L, 2954L, 5000L), Some(5))
    roundTrip(Array(5000000000L, 2852516353L, 2852516354L, 5000000000L), Some(10))
  }

  test("generated regular and irregular series round-trip") {
    val rng = new Random(42)
    roundTrip(DataGeneration.generateTimestamps(1000, irregular = false, rng))
    roundTrip(DataGeneration.generateTimestamps(1000, irregular = true, rng))
  }

  test("random sorted series round-trip") {
    checkAll() { rng =>
      // Timestamps are unique by the data model's invariant.
      val raw = Array.fill(1 + rng.nextInt(50))(math.abs(rng.nextLong()) / 2)
      val timestamps = raw.distinct.sorted
      roundTrip(timestamps)
    }
  }

  test("len of one- and two-point segments") {
    assert(TimestampCodec.len(1658671178037L, 1658671178037L, Array.emptyByteArray) == 1)
    assert(TimestampCodec.len(1658671178037L, 1658671187047L, Array[Byte](10)) == 10)
  }
}
