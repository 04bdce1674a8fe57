package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CompressorSpec extends AnyFunSuite with SeededChecks {

  private def gridAll(segments: Seq[Segment]): (Array[Long], Array[Float]) = {
    val ts = new LongBuf()
    val vs = new FloatBuf()
    segments.foreach { s =>
      Models.grid(s.modelTypeId, s.startTime, s.endTime, s.timestamps,
        s.minValue, s.maxValue, s.values, s.residuals, ts, vs)
    }
    (ts.toArray, vs.toArray)
  }

  private def checkRoundTrip(
      timestamps: Array[Long], values: Array[Float], bound: ErrorBound): Seq[Segment] = {
    val segments = Compressor.compressUnivariate(timestamps, values, bound)
    val (gridTs, gridVs) = gridAll(segments)
    assert(gridTs.toSeq == timestamps.toSeq, "timestamps must round-trip losslessly")
    assert(gridVs.length == values.length)
    gridVs.zip(values).zipWithIndex.foreach { case ((approx, orig), i) =>
      assert(Models.isValueWithinErrorBound(bound, orig, approx),
        s"index $i: $approx not within $bound of $orig")
    }
    // Segments must tile the series without overlap.
    segments.sliding(2).foreach {
      case Seq(a, b) => assert(a.endTime < b.startTime)
      case _ =>
    }
    segments
  }

  test("lossless compression round-trips mixed generated series (regular)") {
    val (ts, vs) = DataGeneration.generateMixedSeries(5000, irregular = false, None)
    val segments = checkRoundTrip(ts, vs, ErrorBound.Lossless)
    val (_, gridVs) = gridAll(segments)
    gridVs.zip(vs).foreach { case (d, o) => assert(d == o) }
  }

  test("lossless compression round-trips mixed generated series (irregular)") {
    val (ts, vs) = DataGeneration.generateMixedSeries(5000, irregular = true, None)
    checkRoundTrip(ts, vs, ErrorBound.Lossless)
  }

  test("absolute bound holds on noisy generated series") {
    val (ts, vs) = DataGeneration.generateMixedSeries(5000, irregular = false, Some(0.5f))
    checkRoundTrip(ts, vs, ErrorBound.absolute(1.0f))
  }

  test("relative bound holds on noisy generated series") {
    val (ts, vs) = DataGeneration.generateMixedSeries(5000, irregular = true, Some(0.2f))
    checkRoundTrip(ts, vs, ErrorBound.relative(5.0f))
  }

  test("all three model types appear") {
    val (ts, vs) = DataGeneration.generateMixedSeries(5000, irregular = false, None)
    val types = Compressor.compressUnivariate(ts, vs, ErrorBound.absolute(0.1f))
      .map(_.modelTypeId).toSet
    assert(types.contains(Models.PmcMeanId), "expected a PMC-Mean segment")
    assert(types.contains(Models.SwingId), "expected a Swing segment")

    // A long unfittable run at the start becomes a standalone MacaqueV
    // segment (runs of <=255 residuals only attach to a preceding model).
    val rng = new scala.util.Random(7)
    val randTs = Array.tabulate(400)(i => 100L * (i + 1))
    val randVs = DataGeneration.generateValues(
      400, DataGeneration.RandomValues(-50.0f, 50.0f), None, rng)
    val randTypes = Compressor.compressUnivariate(
      randTs, randVs, ErrorBound.absolute(0.1f)).map(_.modelTypeId).toSet
    assert(randTypes.contains(Models.MacaqueVId), "expected a MacaqueV segment")
  }

  test("segment len matches gridded point count and sum matches gridded sum") {
    val (ts, vs) = DataGeneration.generateMixedSeries(3000, irregular = false, Some(0.3f))
    val segments = Compressor.compressUnivariate(ts, vs, ErrorBound.absolute(1.0f))
    segments.foreach { s =>
      val (gTs, gVs) = s.gridded
      assert(s.length == gTs.length)
      val gridSum = gVs.foldLeft(0.0)(_ + _)
      val modelSum = s.sum
      val tolerance = math.max(1e-2, math.abs(gridSum) * 1e-5)
      assert(math.abs(modelSum - gridSum) <= tolerance,
        s"model sum $modelSum != grid sum $gridSum for type ${s.modelTypeId}")
    }
  }

  test("fast edge values are bit-identical to gridded endpoints") {
    // Every model type, both spacings, lossy and lossless (lossy mixes
    // PMC/Swing with residual tails; lossless forces MacaqueV runs).
    for {
      irregular <- Seq(false, true)
      bound <- Seq(ErrorBound.Lossless, ErrorBound.absolute(0.5f),
        ErrorBound.relative(2.0f))
    } {
      val (ts, vs) = DataGeneration.generateMixedSeries(3000, irregular, Some(0.3f))
      val segments = Compressor.compressUnivariate(ts, vs, bound)
      assert(segments.nonEmpty)
      segments.foreach { s =>
        val (gTs, gVs) = s.gridded
        val edges = Models.edgeValues(s.modelTypeId, s.startTime, s.endTime,
          s.timestamps, s.minValue, s.maxValue, s.values, s.residuals)
        def bits(f: Float) = java.lang.Float.floatToRawIntBits(f)
        assert(bits(edges(0)) == bits(gVs.head) && bits(edges(1)) == bits(gVs.last),
          s"edges (${edges(0)}, ${edges(1)}) != gridded endpoints " +
            s"(${gVs.head}, ${gVs.last}) for model ${s.modelTypeId} " +
            s"res=${Models.residualsLength(s.residuals)} irregular=$irregular")
        assert(gTs.head == s.startTime && gTs.last == s.endTime)
      }
    }
  }

  test("count/min/max from segment metadata match gridded values") {
    val (ts, vs) = DataGeneration.generateMixedSeries(3000, irregular = true, Some(0.3f))
    val segments = Compressor.compressUnivariate(ts, vs, ErrorBound.absolute(1.0f))
    val (gridTs, gridVs) = gridAll(segments)
    assert(segments.map(_.length).sum == gridTs.length)
    assert(segments.map(_.minValue).min == gridVs.min)
    assert(segments.map(_.maxValue).max == gridVs.max)
  }

  test("compression shrinks well-behaved data versus raw floats") {
    val (ts, vs) = DataGeneration.generateMixedSeries(5000, irregular = false, Some(0.05f))
    val segments = Compressor.compressUnivariate(ts, vs, ErrorBound.relative(5.0f))
    val compressedBytes = segments.map(s =>
      Models.CompressedMetadataSizeInBytes + s.timestamps.length +
        s.values.length + s.residuals.length).sum
    val rawBytes = 12 * vs.length
    assert(compressedBytes < rawBytes,
      s"compressed $compressedBytes >= raw $rawBytes")
  }

  test("NaN runs round-trip losslessly, alone and against residual runs") {
    // An all-NaN run fits PMC-Mean under the lossless equal-or-NaN rule;
    // followed by an incompressible run it must NOT absorb those values as
    // residuals (NaN breaks the min/max parameter re-encode orderings and
    // the residual XOR seed). Exact bit-level identity is required.
    val rng = new scala.util.Random(11)
    val patterns = Seq[Int => Float](
      i => if (i < 60) Float.NaN else (rng.nextFloat() * 2 - 1) * 1e5f,
      i => if (i >= 60 && i < 120) Float.NaN
        else if (i % 7 == 0) Float.NaN
        else (rng.nextFloat() * 2 - 1) * 1e5f,
      _ => Float.NaN,
      i => if (i % 2 == 0) Float.NaN else 42.0f)
    patterns.foreach { f =>
      val vs = Array.tabulate(180)(f)
      val ts = Array.tabulate(180)(i => 100L + 60000000L * i)
      val segments = Compressor.compressUnivariate(ts, vs, ErrorBound.Lossless)
      val (gridTs, gridVs) = gridAll(segments)
      assert(gridTs.toSeq == ts.toSeq)
      gridVs.zip(vs).zipWithIndex.foreach { case ((d, o), i) =>
        assert(d == o || (d.isNaN && o.isNaN), s"index $i: decoded $d != $o")
      }
    }
  }

  test("random series round-trip under every bound") {
    val bounds = Seq(ErrorBound.Lossless, ErrorBound.absolute(0.5f), ErrorBound.relative(5.0f))
    checkAll(iterations = 150) { rng =>
      val vs = randomFloats(rng, maxLen = 200)(r => (r.nextFloat() * 2 - 1) * 1e5f)
      val ts = Array.tabulate(vs.length)(i => 100L + 100L * i)
      checkRoundTrip(ts, vs, bounds(rng.nextInt(bounds.length)))
    }
  }

  test("single point and empty input") {
    assert(Compressor.compressUnivariate(Array.emptyLongArray, Array.emptyFloatArray,
      ErrorBound.Lossless).isEmpty)
    val segments = Compressor.compressUnivariate(
      Array(1000L), Array(42.0f), ErrorBound.Lossless)
    assert(segments.length == 1)
    val (gTs, gVs) = segments.head.gridded
    assert(gTs.toSeq == Seq(1000L) && gVs.toSeq == Seq(42.0f))
  }
}
