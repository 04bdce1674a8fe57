package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BitsSpec extends AnyFunSuite with SeededChecks {

  test("reading known test bytes bit by bit") {
    val bytes = Array[Byte](255.toByte, 170.toByte, 0)
    val expected = Seq(
      true, true, true, true, true, true, true, true, true, false, true, false,
      true, false, true, false, false, false, false, false, false, false, false, false)
    val reader = new BitReader(bytes)
    expected.foreach(bit => assert(reader.readBit() == bit))
    assert(reader.isEmpty)
  }

  test("remaining bits") {
    val bits = new BitReader(Array[Byte](0, 255.toByte))
    assert(bits.remainingBits == 16)
    bits.readBits(4)
    assert(bits.remainingBits == 12)
    bits.readBits(8)
    assert(bits.remainingBits == 4)
    bits.readBits(4)
    assert(bits.remainingBits == 0)
    assert(bits.isEmpty)
  }

  test("finish with one bits pads partial byte") {
    val b = new BitVecBuilder()
    b.appendBits(15, 4)
    val bytes = b.finishWithOneBits()
    assert(bytes.length == 1)
    assert((bytes(0) & 0xff) == 255)
  }

  test("round-trip random bit sequences") {
    checkAll() { rng =>
      val bits = Array.fill(1 + rng.nextInt(64))(rng.nextBoolean())
      val builder = new BitVecBuilder()
      bits.foreach(b => if (b) builder.appendAOneBit() else builder.appendAZeroBit())
      val reader = new BitReader(builder.finish())
      bits.foreach(b => assert(reader.readBit() == b))
    }
  }

  test("round-trip multi-bit appends of varying width") {
    checkAll() { rng =>
      val width = 1 + rng.nextInt(63)
      val values = Array.fill(1 + rng.nextInt(20))(
        math.abs(rng.nextLong()) & ((1L << width) - 1))
      val builder = new BitVecBuilder()
      values.foreach(v => builder.appendBits(v, width))
      val reader = new BitReader(builder.finish())
      values.foreach(v => assert(reader.readBits(width) == v))
    }
  }
}
