package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ModelsSpec extends AnyFunSuite with SeededChecks {

  test("same value is always within lossless bound") {
    checkAll() { rng =>
      val v = randomFloatAny(rng)
      assert(Models.isValueWithinErrorBound(ErrorBound.Lossless, v, v))
    }
  }

  test("non-finite values only match themselves under max bounds") {
    val absMax = ErrorBound.absolute(Float.MaxValue)
    val relMax = ErrorBound.relative(100.0f)
    checkAll() { rng =>
      val v = randomFloatAny(rng)
      if (v != Float.PositiveInfinity) {
        assert(!Models.isValueWithinErrorBound(absMax, Float.PositiveInfinity, v))
        assert(!Models.isValueWithinErrorBound(relMax, Float.PositiveInfinity, v))
        assert(!Models.isValueWithinErrorBound(absMax, v, Float.PositiveInfinity))
      }
      if (!v.isNaN) {
        assert(!Models.isValueWithinErrorBound(absMax, Float.NaN, v))
        assert(!Models.isValueWithinErrorBound(relMax, v, Float.NaN))
      }
    }
  }

  test("close values are within non-zero bounds") {
    assert(Models.isValueWithinErrorBound(ErrorBound.absolute(1.0f), 10.0f, 11.0f))
    assert(Models.isValueWithinErrorBound(ErrorBound.relative(10.0f), 10.0f, 11.0f))
    assert(!Models.isValueWithinErrorBound(ErrorBound.absolute(0.5f), 10.0f, 11.0f))
  }

  test("pmc-mean fits constant sequences losslessly") {
    for (v <- Seq(0.0f, -13.37f, Float.NaN, Float.PositiveInfinity)) {
      val m = new PmcMean(ErrorBound.Lossless)
      (0 until 5).foreach(_ => assert(m.fitValue(v)))
      if (v.isNaN) assert(m.model.isNaN) else assert(m.model == v)
    }
  }

  test("pmc-mean within absolute bound five fits wiggly sequence") {
    val m = new PmcMean(ErrorBound.absolute(5.0f))
    assert(Seq(42.0f, 42.0f, 42.8f, 42.0f, 42.0f).forall(m.fitValue))
    val lossless = new PmcMean(ErrorBound.Lossless)
    assert(!Seq(42.0f, 42.0f, 42.8f, 42.0f, 42.0f).forall(lossless.fitValue))
  }

  test("pmc-mean cannot mix nan/infinity with other values") {
    val m = new PmcMean(ErrorBound.absolute(Float.MaxValue))
    assert(m.fitValue(37.0f))
    assert(!m.fitValue(Float.NaN))
    val m2 = new PmcMean(ErrorBound.absolute(Float.MaxValue))
    assert(m2.fitValue(Float.PositiveInfinity))
    assert(!m2.fitValue(37.0f))
  }

  test("swing fits linear sequences exactly") {
    val m = new Swing(ErrorBound.Lossless)
    val ts = Array(1000L, 2000L, 3000L, 4000L, 5000L)
    val vs = ts.map(t => 0.5f * t + 10.0f)
    ts.zip(vs).foreach { case (t, v) => assert(m.fitDataPoint(t, v)) }
    val (first, last) = m.model
    assert(math.abs(first - 510.0f) < 1e-3)
    assert(math.abs(last - 2510.0f) < 1e-3)
  }

  test("swing grid reproduces linear values within bound") {
    val ts = Array(1000L, 2000L, 3000L, 4000L, 5000L)
    val vs = ts.map(t => -2.0f * t + 100.0f)
    val m = new Swing(ErrorBound.absolute(1.0f))
    ts.zip(vs).foreach { case (t, v) => assert(m.fitDataPoint(t, v)) }
    val (first, last) = m.model
    val out = new FloatBuf()
    Swing.grid(ts.head, ts.last, first, last, ts, 0, ts.length, out)
    out.toArray.zip(vs).foreach { case (approx, orig) =>
      assert(math.abs(approx - orig) <= 1.0f)
    }
  }

  test("swing rejects values outside the bound") {
    val m = new Swing(ErrorBound.absolute(0.1f))
    assert(m.fitDataPoint(1000L, 10.0f))
    assert(m.fitDataPoint(2000L, 20.0f))
    assert(!m.fitDataPoint(3000L, 10.0f))
  }

  test("macaque-v lossless round-trips arbitrary float sequences") {
    checkAll(iterations = 200) { rng =>
      val arr = randomFloats(rng)(randomFloatAny)
      val m = new MacaqueV(ErrorBound.Lossless)
      m.compressValues(arr)
      val (bytes, _, _) = m.model
      val out = new FloatBuf()
      MacaqueV.grid(bytes, arr.length, out, hasModelLastValue = false, 0.0f)
      val decoded = out.toArray
      assert(decoded.length == arr.length)
      decoded.zip(arr).foreach { case (d, o) =>
        assert(
          java.lang.Float.floatToRawIntBits(d) == java.lang.Float.floatToRawIntBits(o),
          s"decoded $d != original $o")
      }
    }
  }

  test("macaque-v lossy stays within relative bound") {
    val bound = ErrorBound.relative(10.0f)
    checkAll(iterations = 200) { rng =>
      val arr = randomFloats(rng)(r => (r.nextFloat() * 2 - 1) * 1e6f)
      val m = new MacaqueV(bound)
      m.compressValues(arr)
      val (bytes, _, _) = m.model
      val out = new FloatBuf()
      MacaqueV.grid(bytes, arr.length, out, hasModelLastValue = false, 0.0f)
      out.toArray.zip(arr).foreach { case (d, o) =>
        assert(Models.isValueWithinErrorBound(bound, o, d), s"$d not within 10% of $o")
      }
    }
  }

  test("macaque-v sum matches gridded sum") {
    checkAll(iterations = 200) { rng =>
      val arr = randomFloats(rng)(r => (r.nextFloat() * 2 - 1) * 1e4f)
      val m = new MacaqueV(ErrorBound.Lossless)
      m.compressValues(arr)
      val (bytes, _, _) = m.model
      val s = MacaqueV.sum(arr.length, bytes, hasModelLastValue = false, 0.0f)
      val expected = arr.foldLeft(0.0f)(_ + _)
      assert(math.abs(s - expected) <= math.max(1e-3f, math.abs(expected) * 1e-5f))
    }
  }
}
