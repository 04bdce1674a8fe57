package graft.core

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** [[ValueCounts]] must agree bit-for-bit with grid-then-filter on every
  * segment the compressor can produce: the Swing binary searches, PMC
  * closed forms, MacaqueV walks, residual tails, regular/irregular
  * timestamp clipping, and NaN handling are all pinned against the decoded
  * truth here. The metadata fast paths layered on top in
  * [[graft.tsdb.SegmentAggregates]] additionally rely on the stored value
  * bounds containing every reconstructed value — pinned below too.
  */
class ValueCountsSpec extends AnyFunSuite with SeededChecks {

  private def segmentsFor(seed: Long, irregular: Boolean,
      bound: ErrorBound, noise: Option[Float]): Seq[(Segment, Array[Long], Array[Float])] = {
    val (ts, vs) = DataGeneration.generateMixedSeries(
      600, irregular, noise, seed)
    Compressor.compressUnivariate(ts, vs, bound).map { s =>
      val (gt, gv) = s.gridded
      (s, gt, gv)
    }
  }

  private val corpora: Seq[(Segment, Array[Long], Array[Float])] =
    (for {
      seed <- 1L to 6L
      irregular <- Seq(false, true)
      (bound, noise) <- Seq(
        (ErrorBound.Lossless, None),
        (ErrorBound.absolute(0.5f), Some(0.4f)),
        (ErrorBound.relative(2.0f), Some(0.2f)))
    } yield segmentsFor(seed, irregular, bound, noise)).flatten

  private def refCount(gv: Array[Float], gt: Array[Long], lo: Double,
      hi: Double, tsLo: Long, tsHi: Long): Long =
    gv.indices.count { i =>
      val d = gv(i).toDouble
      gt(i) >= tsLo && gt(i) <= tsHi &&
        ValueCounts.sqlCompare(d, lo) > 0 && ValueCounts.sqlCompare(d, hi) <= 0
    }.toLong

  private def refHist(gv: Array[Float], gt: Array[Long], origin: Double,
      width: Double, tsLo: Long, tsHi: Long): Map[Long, Long] =
    gv.indices
      .filter(i => gt(i) >= tsLo && gt(i) <= tsHi &&
        java.lang.Float.isFinite(gv(i)))
      .groupBy(i => math.floor((gv(i).toDouble - origin) / width).toLong)
      .map { case (b, is) => b -> is.size.toLong }

  test("countInRange matches grid-then-filter on every compressor output") {
    val rng = new Random(7L)
    for ((s, gt, gv) <- corpora) {
      val finite = gv.filter(java.lang.Float.isFinite)
      val candidates = Seq(
        Double.NegativeInfinity, Double.PositiveInfinity, Double.NaN, 0.0,
        if (finite.nonEmpty) finite(rng.nextInt(finite.length)).toDouble
        else 1.0,
        if (finite.nonEmpty) finite.min.toDouble else -1.0,
        if (finite.nonEmpty) finite.max.toDouble else 1.0,
        rng.nextDouble() * 200 - 100)
      for (lo <- candidates; hi <- candidates
          if ValueCounts.sqlCompare(lo, hi) < 0) {
        val got = ValueCounts.countInRange(lo, hi, Long.MinValue,
          Long.MaxValue, s.modelTypeId, s.startTime, s.endTime,
          s.timestamps, s.minValue, s.maxValue, s.values, s.residuals)
        assert(got == refCount(gv, gt, lo, hi, Long.MinValue, Long.MaxValue),
          s"model=${s.modelTypeId} lo=$lo hi=$hi")
      }
    }
  }

  test("countInRange honors timestamp windows incl. exact edges") {
    val rng = new Random(11L)
    for ((s, gt, gv) <- corpora) {
      val lo = -30.0
      val hi = 30.0
      val windows = Seq(
        (gt.head, gt.last), // all
        (gt.head + 1, gt.last - 1),
        (gt(gt.length / 3), gt(2 * gt.length / 3)), // exact point edges
        (gt.last + 1, Long.MaxValue), // empty
        (Long.MinValue, gt.head - 1), // empty
        (gt.head + rng.nextInt(50), gt.last - rng.nextInt(50)))
      for ((tsLo, tsHi) <- windows) {
        val got = ValueCounts.countInRange(lo, hi, tsLo, tsHi,
          s.modelTypeId, s.startTime, s.endTime, s.timestamps,
          s.minValue, s.maxValue, s.values, s.residuals)
        assert(got == refCount(gv, gt, lo, hi, tsLo, tsHi),
          s"model=${s.modelTypeId} window=($tsLo,$tsHi) len=${gv.length}")
        val gotLen = ValueCounts.clippedLen(tsLo, tsHi, s.startTime,
          s.endTime, s.timestamps)
        assert(gotLen == gt.count(t => t >= tsLo && t <= tsHi).toLong)
      }
    }
  }

  test("histogram matches grid-then-bin on every compressor output") {
    for ((s, gt, gv) <- corpora) {
      for ((origin, width) <- Seq((0.0, 10.0), (-3.7, 0.9), (0.0, 1000.0))) {
        val pairs = ValueCounts.histogram(origin, width, Long.MinValue,
          Long.MaxValue, s.modelTypeId, s.startTime, s.endTime,
          s.timestamps, s.minValue, s.maxValue, s.values, s.residuals)
        val got = pairs.grouped(2).map(p => p(0) -> p(1)).toMap
        assert(got == refHist(gv, gt, origin, width, Long.MinValue,
          Long.MaxValue), s"model=${s.modelTypeId} o=$origin w=$width")
        // Bins must come out ascending (merge determinism).
        val bins = pairs.grouped(2).map(_.head).toSeq
        assert(bins == bins.sorted)
      }
    }
  }

  test("histogram honors timestamp windows") {
    for ((s, gt, gv) <- corpora) {
      val (tsLo, tsHi) = (gt(gt.length / 4), gt(3 * gt.length / 4))
      val pairs = ValueCounts.histogram(0.0, 7.3, tsLo, tsHi,
        s.modelTypeId, s.startTime, s.endTime, s.timestamps,
        s.minValue, s.maxValue, s.values, s.residuals)
      val got = pairs.grouped(2).map(p => p(0) -> p(1)).toMap
      assert(got == refHist(gv, gt, 0.0, 7.3, tsLo, tsHi))
    }
  }

  test("NaN and infinity values follow the SQL total order (NaN greatest)") {
    val ts = Array(1000L, 2000L, 3000L, 4000L)
    val vs = Array(Float.NaN, Float.NaN, Float.NaN, Float.NaN)
    for (s <- Compressor.compressUnivariate(ts, vs, ErrorBound.Lossless)) {
      // `v <= +Inf` excludes NaN (Spark/DuckDB agree)...
      assert(ValueCounts.countInRange(Double.NegativeInfinity,
        Double.PositiveInfinity, Long.MinValue, Long.MaxValue,
        s.modelTypeId, s.startTime, s.endTime, s.timestamps,
        s.minValue, s.maxValue, s.values, s.residuals) == 0L)
      // ...while the unbounded (NaN) sentinel is SQL `v > 0`: NaN counts.
      assert(ValueCounts.countInRange(0.0, Double.NaN,
        Long.MinValue, Long.MaxValue,
        s.modelTypeId, s.startTime, s.endTime, s.timestamps,
        s.minValue, s.maxValue, s.values, s.residuals) == 4L)
      assert(ValueCounts.histogram(0.0, 10.0, Long.MinValue, Long.MaxValue,
        s.modelTypeId, s.startTime, s.endTime, s.timestamps,
        s.minValue, s.maxValue, s.values, s.residuals).isEmpty)
    }
    val inf = Array(Float.PositiveInfinity, Float.PositiveInfinity,
      Float.PositiveInfinity, Float.PositiveInfinity)
    for (s <- Compressor.compressUnivariate(ts, inf, ErrorBound.Lossless)) {
      // +Inf <= +Inf: the count side sees it, the histogram skips it.
      assert(ValueCounts.countInRange(0.0, Double.PositiveInfinity,
        Long.MinValue, Long.MaxValue, s.modelTypeId, s.startTime,
        s.endTime, s.timestamps, s.minValue, s.maxValue, s.values,
        s.residuals) == 4L)
      assert(ValueCounts.histogram(0.0, 10.0, Long.MinValue, Long.MaxValue,
        s.modelTypeId, s.startTime, s.endTime, s.timestamps,
        s.minValue, s.maxValue, s.values, s.residuals).isEmpty)
    }
  }

  test("totalOrderKey is a monotone bijection onto the SQL float order") {
    checkAll(2000) { rng =>
      val a = randomFloatAny(rng)
      val b = randomFloatAny(rng)
      if (!a.isNaN && !b.isNaN) {
        val ka = ValueCounts.totalOrderKey(a)
        val kb = ValueCounts.totalOrderKey(b)
        assert(Integer.signum(java.lang.Long.compare(ka, kb)) ==
          Integer.signum(ValueCounts.sqlCompare(a.toDouble, b.toDouble)),
          s"$a vs $b")
        // Round trip (zeros normalize to +0.0).
        val back = ValueCounts.floatFromKey(ka)
        assert(ValueCounts.sqlCompare(back.toDouble, a.toDouble) == 0)
      }
    }
    assert(ValueCounts.floatFromKey(
      ValueCounts.totalOrderKey(Float.NegativeInfinity)) ==
      Float.NegativeInfinity)
    assert(ValueCounts.floatFromKey(
      ValueCounts.totalOrderKey(Float.PositiveInfinity)) ==
      Float.PositiveInfinity)
    assert(ValueCounts.totalOrderKey(-0.0f) == ValueCounts.totalOrderKey(0.0f))
  }

  test("stored bounds contain every reconstructed value (fast-path soundness)") {
    // The metadata fast paths (all-in → len, single-bin → len) are sound
    // only if min_value <= v <= max_value for every reconstructed v of a
    // segment that cannot hide NaN. Pin it across the corpus.
    for ((s, _, gv) <- corpora) {
      val nanCapable = s.modelTypeId == Models.MacaqueVId ||
        s.residuals.nonEmpty
      if (!nanCapable && !s.minValue.isNaN && !s.maxValue.isNaN) {
        for (v <- gv) {
          assert(v >= s.minValue && v <= s.maxValue,
            s"model=${s.modelTypeId}: $v outside [${s.minValue}, ${s.maxValue}]")
        }
      }
    }
  }
}
