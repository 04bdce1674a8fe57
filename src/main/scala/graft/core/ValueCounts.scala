package graft.core

/** Segment-native value-predicate counting and fixed-width value histograms:
  * how many of a segment's reconstructed values fall in a value interval, or
  * in each histogram bin — WITHOUT materializing the point stream. Beyond
  * the reference, whose aggregate rewrite turns itself off as soon as any
  * value predicate is present
  * (/root/reference/crates/modelardb_storage/src/optimizer/model_simple_aggregates.rs:175-334).
  *
  * Per model type:
  *  - PMC-Mean: every model value is the stored constant — O(1).
  *  - Swing: the reconstructed values replay `(slope·t + intercept).toFloat`
  *    at the grid timestamps, and both double arithmetic and the
  *    double→float rounding are MONOTONE maps — so the value sequence is
  *    monotone in time and any threshold count is an exact binary search
  *    over the closed-form evaluation, O(log len) instead of O(len).
  *  - MacaqueV (and residual tails): the value bit-stream is walked
  *    directly; timestamps never decode.
  * Timestamps are only touched for time-window clipping or irregular Swing
  * segments, and regular segments clip in O(1) arithmetic.
  *
  * All evaluations are bit-identical with [[Models.grid]]'s reconstruction,
  * so counts match a grid-then-filter plan exactly (spec-pinned).
  */
object ValueCounts {

  /** Spark/DuckDB SQL float comparison semantics as a total order: NaN is
    * GREATER than every value (so `v > 0` is true for NaN in both engines)
    * and -0.0 equals 0.0. Bounds therefore use Double.NaN as the "no upper
    * bound" sentinel — the order's maximum element — rather than +Inf,
    * which `v <= +Inf` would exclude NaN from.
    */
  def sqlCompare(v: Double, x: Double): Int = {
    val a = if (v == 0.0) 0.0 else v
    val b = if (x == 0.0) 0.0 else x
    java.lang.Double.compare(a, b)
  }

  /** Monotone integer key of a non-NaN float under [[sqlCompare]]'s order:
    * k(a) < k(b) ⇔ a < b (with -0.0 normalized to +0.0 first, so the two
    * zeros share a key). The keys are dense in [0, 2^32), which makes
    * "the smallest float satisfying a monotone predicate" a plain binary
    * search — the driver loop behind exact segment-native quantiles.
    */
  def totalOrderKey(f: Float): Long = {
    val n = if (f == 0.0f) 0.0f else f
    val bits = java.lang.Float.floatToIntBits(n)
    if (bits >= 0) bits.toLong + 0x80000000L
    else (~bits).toLong & 0xffffffffL
  }

  /** Inverse of [[totalOrderKey]] (up to the zero normalization). */
  def floatFromKey(key: Long): Float = {
    require(key >= 0L && key < 0x100000000L, s"key out of range: $key")
    val bits =
      if (key >= 0x80000000L) (key - 0x80000000L).toInt
      else ~key.toInt
    java.lang.Float.intBitsToFloat(bits)
  }

  /** Count of reconstructed values v with lower < v <= upper under
    * [[sqlCompare]]'s total order, among points whose timestamp lies in
    * [tsLo, tsHi]. Pass Long.MinValue/MaxValue for no clipping and
    * Double.NaN as `upper` for "no upper bound" (includes NaN values,
    * matching SQL `v > lower`).
    */
  def countInRange(lower: Double, upper: Double, tsLo: Long, tsHi: Long,
      mt: Byte, st: Long, et: Long, tsBytes: Array[Byte],
      mn: Float, mx: Float, values: Array[Byte],
      residuals: Array[Byte]): Long = {
    if (sqlCompare(lower, upper) >= 0) return 0L
    val acc = new CountAcc(lower, upper)
    traverse(tsLo, tsHi, mt, st, et, tsBytes, mn, mx, values, residuals, acc)
    acc.count
  }

  /** Distinct reconstructed values v with lower < v <= upper (both finite,
    * [[sqlCompare]] total order) and their multiplicities, among points
    * whose timestamp lies in [tsLo, tsHi] — the kernel behind the
    * federated rank search's bounded fetch. Returns interleaved
    * (value, count) pairs as doubles (counts are exact: a fetch interval
    * holds at most the fetch-gap many points). -0.0 normalizes to 0.0,
    * matching Spark's grouping-key normalization of the generic SQL
    * fetch it replaces. Interior segments (stored bounds fully outside
    * the interval) return empty with zero decode.
    */
  def valuesInRange(lower: Double, upper: Double, tsLo: Long, tsHi: Long,
      mt: Byte, st: Long, et: Long, tsBytes: Array[Byte],
      mn: Float, mx: Float, values: Array[Byte],
      residuals: Array[Byte]): Array[Double] = {
    require(!lower.isNaN && !upper.isNaN,
      "valuesInRange needs finite-or-infinite, non-NaN bounds")
    if (sqlCompare(lower, upper) >= 0) return Array.emptyDoubleArray
    // NaN-ignoring stored bounds: every non-NaN value sits in [mn, mx];
    // a hidden NaN fails the finite upper bound anyway, so the interval
    // misses the whole segment when mx <= lower or mn > upper.
    if (!mx.isNaN && sqlCompare(mx.toDouble, lower) <= 0)
      return Array.emptyDoubleArray
    if (!mn.isNaN && sqlCompare(mn.toDouble, upper) > 0)
      return Array.emptyDoubleArray
    val acc = new ValuesAcc(lower, upper)
    traverse(tsLo, tsHi, mt, st, et, tsBytes, mn, mx, values, residuals, acc)
    acc.result()
  }

  private final class ValuesAcc(lower: Double, upper: Double) extends Acc {
    // Keyed by the value's float bits with -0.0 canonicalized to 0.0
    // (Spark normalizes signed zero in grouping keys); NaN never enters
    // (the finite upper bound excludes it under the total order).
    private val counts = scala.collection.mutable.LongMap.empty[Long]

    private def in(v: Float): Boolean = {
      val d = v.toDouble
      sqlCompare(d, lower) > 0 && sqlCompare(d, upper) <= 0
    }

    private def add(v: Float, n: Long): Unit = {
      val canon = if (v == 0.0f) 0.0f else v
      val key = java.lang.Float.floatToRawIntBits(canon).toLong
      counts(key) = counts.getOrElse(key, 0L) + n
    }

    override def addConstant(v: Float, n: Int, at: Int): Unit =
      if (in(v)) add(v, n.toLong)

    override def addValue(v: Float, at: Int): Unit = if (in(v)) add(v, 1L)

    override def addMonotone(eval: Int => Float, from: Int, until: Int): Unit = {
      // Only the in-range index window is visited: the run is monotone,
      // so (lower, upper] selects a contiguous slice located by the same
      // binary searches the count kernels use.
      val cLo = monotoneCountLE(lower, eval, from, until)
      val cHi = monotoneCountLE(upper, eval, from, until)
      val nonDecr = !(eval(from) > eval(until - 1))
      val (a, b) =
        if (nonDecr) (from + cLo, from + cHi)
        else (until - cHi, until - cLo)
      var i = a
      while (i < b) { add(eval(i), 1L); i += 1 }
    }

    def result(): Array[Double] = {
      val out = new Array[Double](counts.size * 2)
      var i = 0
      counts.foreach { case (bits, n) =>
        out(i) = java.lang.Float.intBitsToFloat(bits.toInt).toDouble
        out(i + 1) = n.toDouble
        i += 2
      }
      out
    }
  }

  /** Number of points whose timestamp lies in [tsLo, tsHi] — timestamps
    * only, O(1) for regular segments.
    */
  def clippedLen(tsLo: Long, tsHi: Long, st: Long, et: Long,
      tsBytes: Array[Byte]): Long = {
    val totalLen = TimestampCodec.len(st, et, tsBytes)
    val w = indexWindow(tsLo, tsHi, st, et, tsBytes, totalLen, () => {
      val buf = new LongBuf(math.max(totalLen, 16))
      TimestampCodec.decompressAllTimestamps(st, et, tsBytes, buf)
      buf
    })
    val from = (w >>> 32).toInt
    val until = (w & 0xffffffffL).toInt
    math.max(0, until - from).toLong
  }

  /** Fixed-width histogram of the segment's FINITE reconstructed values at
    * timestamps within [tsLo, tsHi]: bin = floor((v - origin) / width) in
    * f64, identical to the SQL `floor((cast(v as double) - origin) / width)`
    * both Spark and DuckDB compute. Returns interleaved (bin, count) pairs
    * with bins ascending; NaN/±Inf values are skipped — unless `sparkBins`
    * is set, which instead reproduces Spark's `FLOOR(double)->LONG`
    * semantics on non-finite values exactly (the double arithmetic then
    * `.toLong`): NaN lands in bin 0, +Inf in Long.MaxValue, -Inf in
    * Long.MinValue. The SQL rewrite uses that mode so a spliced
    * histogram is bit-identical to the Aggregate it replaces on ANY data.
    */
  def histogram(origin: Double, width: Double, tsLo: Long, tsHi: Long,
      mt: Byte, st: Long, et: Long, tsBytes: Array[Byte],
      mn: Float, mx: Float, values: Array[Byte],
      residuals: Array[Byte], sparkBins: Boolean = false): Array[Long] = {
    require(width > 0, "Histogram width must be positive.")
    val acc = new HistAcc(origin, width, sparkBins)
    traverse(tsLo, tsHi, mt, st, et, tsBytes, mn, mx, values, residuals, acc)
    acc.result()
  }

  private sealed trait Acc {
    /** A run of n equal values at point indices [at, at+n). */
    def addConstant(v: Float, n: Int, at: Int): Unit

    /** One value at point index `at`. */
    def addValue(v: Float, at: Int): Unit

    /** Values eval(from until until) are monotone (Swing closed form). */
    def addMonotone(eval: Int => Float, from: Int, until: Int): Unit
  }

  /** Count of i in [from, until) with eval(i) <= x under the SQL total
    * order. The sequence is monotone in the Java float order and NaN can
    * only appear as a whole-constant sequence (a NaN Swing line), so it
    * is monotone in the total order too: the satisfying set is a prefix
    * (non-decreasing) or a suffix (non-increasing).
    */
  private def monotoneCountLE(x: Double, eval: Int => Float, from: Int,
      until: Int): Int = {
    val nonDecr = !(eval(from) > eval(until - 1))
    if (nonDecr) {
      var lo = from
      var hi = until
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (sqlCompare(eval(m).toDouble, x) <= 0) lo = m + 1 else hi = m
      }
      lo - from
    } else {
      var lo = from
      var hi = until
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (sqlCompare(eval(m).toDouble, x) <= 0) hi = m else lo = m + 1
      }
      until - lo
    }
  }

  private final class CountAcc(lower: Double, upper: Double) extends Acc {
    var count = 0L

    private def in(v: Float): Boolean = {
      val d = v.toDouble
      sqlCompare(d, lower) > 0 && sqlCompare(d, upper) <= 0
    }

    private def countLE(x: Double, eval: Int => Float, from: Int,
        until: Int): Int = monotoneCountLE(x, eval, from, until)

    override def addConstant(v: Float, n: Int, at: Int): Unit =
      if (in(v)) count += n.toLong

    override def addValue(v: Float, at: Int): Unit = if (in(v)) count += 1L

    override def addMonotone(eval: Int => Float, from: Int, until: Int): Unit =
      if (until - from <= 8) {
        var i = from
        while (i < until) { addValue(eval(i), i); i += 1 }
      } else {
        count += (countLE(upper, eval, from, until) -
          countLE(lower, eval, from, until)).toLong
      }
  }

  private final class HistAcc(origin: Double, width: Double,
      sparkBins: Boolean = false) extends Acc {
    private val bins = scala.collection.mutable.LongMap.empty[Long]

    // Spark's FLOOR(double) evals math.floor then .toLong, so the same
    // arithmetic extends to non-finite values: NaN -> 0, +Inf ->
    // Long.MaxValue, -Inf -> Long.MinValue. Under sparkBins those counts
    // are kept; the default mode skips non-finite values.
    private def binOf(v: Float): Long =
      math.floor((v.toDouble - origin) / width).toLong

    override def addConstant(v: Float, n: Int, at: Int): Unit =
      if (sparkBins || java.lang.Float.isFinite(v)) {
        val b = binOf(v)
        bins(b) = bins.getOrElse(b, 0L) + n.toLong
      }

    override def addValue(v: Float, at: Int): Unit =
      if (sparkBins || java.lang.Float.isFinite(v)) {
        val b = binOf(v)
        bins(b) = bins.getOrElse(b, 0L) + 1L
      }

    override def addMonotone(eval: Int => Float, from: Int, until: Int): Unit = {
      val vF = eval(from)
      val vL = eval(until - 1)
      if (java.lang.Float.isNaN(vF) && java.lang.Float.isNaN(vL)) {
        // NaN only appears as a whole-constant run (a NaN Swing line).
        if (sparkBins) addConstant(vF, until - from, from)
        return
      }
      val linear = !java.lang.Float.isFinite(vF) ||
        !java.lang.Float.isFinite(vL) || {
          // More bins touched than points — transition search cannot win.
          val span = math.abs(binOf(vL) - binOf(vF)) + 1
          span >= (until - from).toLong
        }
      if (linear) {
        var i = from
        while (i < until) { addValue(eval(i), i); i += 1 }
      } else {
        // The bin index floor((v-o)/w) is a monotone map of a monotone
        // sequence, so equal-bin indices are contiguous: walk the runs,
        // finding each run's end by binary search — O(bins · log len).
        var idx = from
        while (idx < until) {
          val b = binOf(eval(idx))
          var lo = idx + 1
          var hi = until
          while (lo < hi) {
            val m = (lo + hi) >>> 1
            if (binOf(eval(m)) == b) lo = m + 1 else hi = m
          }
          bins(b) = bins.getOrElse(b, 0L) + (lo - idx).toLong
          idx = lo
        }
      }
    }

    def result(): Array[Long] = {
      val keys = bins.keys.toArray
      java.util.Arrays.sort(keys)
      val out = new Array[Long](keys.length * 2)
      var i = 0
      while (i < keys.length) {
        out(2 * i) = keys(i)
        out(2 * i + 1) = bins(keys(i))
        i += 1
      }
      out
    }
  }

  /** (count, Σv, min, max, tFirst, tLast, m2) of the reconstructed values
    * inside the value interval — lower EXCLUSIVE (ignored when `hasLower`
    * is false), upper INCLUSIVE with Double.NaN as the "unbounded"
    * sentinel (the total order's maximum, so NaN values are included) —
    * among points whose timestamp lies in [tsLo, tsHi]. Returned as
    * `Array(count, sum, min, max, tFirst, tLast, m2)` — m2 the CENTERED
    * second moment Σ(v − mean_in_range)² (weighted Welford) — with
    * everything past
    * `sum` meaningful only when count > 0 (an all-NaN in-range set
    * carries NaN min/max — exactly the NaN-greatest order Spark's own
    * MIN/MAX aggregates follow). tFirst/tLast are the µs timestamps of
    * the earliest/latest qualifying point (µs < 2⁵³, exact in f64) — the
    * per-segment partial behind `min(ts)/max(ts) WHERE v > x` and
    * argmin/argmax. The sum accumulates in f64 like [[Models.sumDouble]];
    * min/max/count/timestamps are exact. Stored bounds short-circuit
    * entirely-out segments without touching the binary columns, and a
    * Swing segment's in-range run is located by binary search (values are
    * monotone) so only that run is evaluated.
    */
  def statsInRange(lower: Double, hasLower: Boolean, upper: Double,
      tsLo: Long, tsHi: Long, mt: Byte, st: Long, et: Long,
      tsBytes: Array[Byte], mn: Float, mx: Float, values: Array[Byte],
      residuals: Array[Byte]): Array[Double] =
    statsInRanges(Array(if (hasLower) lower else Double.NaN), Array(upper),
      tsLo, tsHi, mt, st, et, tsBytes, mn, mx, values, residuals)

  /** [[statsInRange]] over a UNION of disjoint intervals — the kernel
    * behind `WHERE v < a OR v > b` (the outlier band) and any disjunction
    * of value ranges the rewrite merges. `los(i)` NaN = that interval is
    * unbounded below (-Inf included); `his(i)` NaN = unbounded above (NaN
    * values included). Intervals MUST be disjoint and ascending: each
    * value then lands in at most one, and the union's stats are exactly
    * the per-value accumulation. One traversal total; a Swing segment
    * binary-searches one run per interval.
    */
  def statsInRanges(los: Array[Double], his: Array[Double],
      tsLo: Long, tsHi: Long, mt: Byte, st: Long, et: Long,
      tsBytes: Array[Byte], mn: Float, mx: Float, values: Array[Byte],
      residuals: Array[Byte]): Array[Double] = {
    require(los.length == his.length && los.nonEmpty,
      "statsInRanges needs matched, non-empty bound arrays")
    val acc = new StatsAcc(los, his)
    // Metadata short-circuit, mirroring SegmentAggregates.allOutCol: the
    // NaN-ignoring stored bounds cover every non-NaN value, and a HIDDEN
    // NaN (MacaqueV / residual tails only) passes any lower bound but
    // fails every finite upper — only the NaN sentinel keeps it in. The
    // segment skips only when EVERY interval excludes it.
    val hideable = mt == Models.MacaqueVId || Models.residualsLength(residuals) > 0
    var allOut = true
    var i = 0
    while (i < los.length && allOut) {
      val hasLower = !java.lang.Double.isNaN(los(i))
      val upperUnbounded = java.lang.Double.isNaN(his(i))
      val emptyInterval =
        hasLower && sqlCompare(los(i), his(i)) >= 0
      val outBelow = hasLower && sqlCompare(mx.toDouble, los(i)) <= 0 &&
        !(upperUnbounded && hideable)
      val outAbove = !upperUnbounded && sqlCompare(mn.toDouble, his(i)) > 0
      if (!emptyInterval && !outBelow && !outAbove) allOut = false
      i += 1
    }
    if (allOut) return acc.result()
    traverse(tsLo, tsHi, mt, st, et, tsBytes, mn, mx, values, residuals, acc)
    val r = acc.result()
    if (r(0) > 0) {
      r(4) = timestampAt(r(4).toInt, st, et, tsBytes).toDouble
      r(5) = timestampAt(r(5).toInt, st, et, tsBytes).toDouble
    }
    r
  }

  /** Timestamp of the segment's i-th point (0-based): O(1) arithmetic for
    * regular segments, a timestamp-stream decode for irregular ones —
    * values never decode.
    */
  def timestampAt(i: Int, st: Long, et: Long, tsBytes: Array[Byte]): Long = {
    val totalLen = TimestampCodec.len(st, et, tsBytes)
    require(i >= 0 && i < totalLen, s"point index $i out of [0, $totalLen)")
    if (totalLen == 1) st
    else if (tsBytes.isEmpty) { if (i == 0) st else et }
    else if (TimestampCodec.areCompressedTimestampsRegular(tsBytes)) {
      val interval = (et - st) / (totalLen - 1)
      st + i.toLong * interval
    } else {
      val buf = new LongBuf(math.max(totalLen, 16))
      TimestampCodec.decompressAllTimestamps(st, et, tsBytes, buf)
      buf(i)
    }
  }

  /** Accumulates over a union of DISJOINT intervals (los(i) NaN = no
    * lower bound, his(i) NaN = unbounded above). First/last indices track
    * by min/max — order-independent, so per-interval monotone runs may
    * arrive out of index order.
    */
  private final class StatsAcc(los: Array[Double], his: Array[Double])
      extends Acc {
    private var count = 0L
    private var sum = 0.0
    // Centered second moment via the weighted Welford/West update — the
    // result slot that used to carry raw Σv² now carries
    // m2 = Σ(v − mean_acc)², cancellation-free at any mean.
    private var wmean = 0.0
    private var m2 = 0.0
    private var mnV = 0.0f
    private var mxV = 0.0f
    private var firstIdx = Int.MaxValue
    private var lastIdx = -1

    private def in(v: Float): Boolean = {
      val d = v.toDouble
      var i = 0
      while (i < los.length) {
        if ((java.lang.Double.isNaN(los(i)) || sqlCompare(d, los(i)) > 0) &&
          sqlCompare(d, his(i)) <= 0) return true
        i += 1
      }
      false
    }

    private def note(v: Float, n: Long, at: Int, to: Int): Unit = {
      if (count == 0L) { mnV = v; mxV = v }
      else {
        if (sqlCompare(v.toDouble, mnV.toDouble) < 0) mnV = v
        if (sqlCompare(v.toDouble, mxV.toDouble) > 0) mxV = v
      }
      if (at < firstIdx) firstIdx = at
      if (to > lastIdx) lastIdx = to
      // Chan merge of (count, wmean, m2) with the n-copies-of-v partial
      // (its internal moment is 0): exact for constant runs, stable for
      // everything else. n·v is exact in f64 for any float v and
      // realistic n (24+31 < 53 mantissa bits).
      val newCount = count + n
      val delta = v.toDouble - wmean
      val r = delta * n.toDouble / newCount.toDouble
      m2 += delta * r * count.toDouble
      wmean += r
      count = newCount
      sum += v.toDouble * n.toDouble
    }

    override def addConstant(v: Float, n: Int, at: Int): Unit =
      if (in(v)) note(v, n.toLong, at, at + n - 1)

    override def addValue(v: Float, at: Int): Unit =
      if (in(v)) note(v, 1L, at, at)

    override def addMonotone(eval: Int => Float, from: Int, until: Int): Unit =
      if (until - from <= 8) {
        var i = from
        while (i < until) { addValue(eval(i), i); i += 1 }
      } else {
        // Intervals are disjoint, so each interval's satisfying indices
        // form one contiguous run of the monotone sequence: locate each
        // with the shared binary searches and evaluate only the runs.
        var k = 0
        while (k < los.length) {
          val leU = monotoneCountLE(his(k), eval, from, until)
          val leL =
            if (java.lang.Double.isNaN(los(k))) 0
            else monotoneCountLE(los(k), eval, from, until)
          val nonDecr = !(eval(from) > eval(until - 1))
          val runFrom = if (nonDecr) from + leL else until - leU
          val runUntil = if (nonDecr) from + leU else until - leL
          var i = runFrom
          while (i < runUntil) { note(eval(i), 1L, i, i); i += 1 }
          k += 1
        }
      }

    def result(): Array[Double] = Array(
      count.toDouble, sum,
      if (count == 0L) Double.NaN else mnV.toDouble,
      if (count == 0L) Double.NaN else mxV.toDouble,
      firstIdx.toDouble, lastIdx.toDouble, m2)
  }

  /** Per-threshold counts of reconstructed values v with v > xs(i) under
    * the SQL total order (NaN counts against every threshold), among
    * points whose timestamp lies in [tsLo, tsHi] — MANY thresholds from
    * ONE traversal: the quantile bisection's ladder probe. Thresholds
    * whose answer the stored bounds settle (all points above / only a
    * possible NaN above) are classified without decoding; a single shared
    * traversal serves whatever remains — per-threshold O(log len) binary
    * searches for Swing, one walk with a sorted-threshold rank per value
    * for MacaqueV.
    */
  def countAboveMulti(xs: Array[Double], tsLo: Long, tsHi: Long,
      mt: Byte, st: Long, et: Long, tsBytes: Array[Byte],
      mn: Float, mx: Float, values: Array[Byte],
      residuals: Array[Byte]): Array[Long] = {
    val out = new Array[Long](xs.length)
    if (xs.isEmpty) return out
    val len = clippedLen(tsLo, tsHi, st, et, tsBytes)
    if (len == 0L) return out
    // Bound classification (Java float compares; stored bounds are
    // NaN-ignoring, NaN bounds fail both tests and fall through):
    //  - mn > x: every non-NaN value is above, NaN is above too → len.
    //  - mx <= x: only a hidden NaN can be above → 0 when none possible.
    val hideable = mt == Models.MacaqueVId || Models.residualsLength(residuals) > 0
    var needTraverse = false
    var i = 0
    while (i < xs.length) {
      val x = xs(i)
      if (mn.toDouble > x && !mn.isNaN) out(i) = len
      else if (mx.toDouble <= x && !mx.isNaN && !hideable) out(i) = 0L
      else { out(i) = Long.MinValue; needTraverse = true }
      i += 1
    }
    if (!needTraverse) return out
    // Traverse with ONLY the unsettled thresholds: the ladder joins a
    // group's full probe array (width 512-2048, mostly +Inf padding or
    // other ranks' brackets) onto every one of its segments, but a
    // segment's own value span settles the vast majority above — the
    // sort/diff machinery then runs at the unsettled count, not width.
    var nSub = 0
    i = 0
    while (i < xs.length) {
      if (out(i) == Long.MinValue) nSub += 1
      i += 1
    }
    val xsSub = new Array[Double](nSub)
    val idxSub = new Array[Int](nSub)
    var j = 0
    i = 0
    while (i < xs.length) {
      if (out(i) == Long.MinValue) { xsSub(j) = xs(i); idxSub(j) = i; j += 1 }
      i += 1
    }
    val acc = new MultiCountAcc(xsSub)
    traverse(tsLo, tsHi, mt, st, et, tsBytes, mn, mx, values, residuals, acc)
    val sub = acc.counts
    j = 0
    while (j < nSub) {
      out(idxSub(j)) = sub(j)
      j += 1
    }
    out
  }

  private final class MultiCountAcc(xs: Array[Double]) extends Acc {
    // Thresholds sorted once (by the SQL total order) so each decoded
    // value costs O(log width) — binary search + one difference-array
    // bump — instead of O(width) compares. `counts` materializes the
    // prefix-summed contributions back into the CALLER'S threshold order
    // on first read. Probe arrays of the distributed quantile ladder run
    // at width 256-512, where the linear scan dominated kernel time.
    private val order: Array[Int] = {
      val idx = Array.tabulate(xs.length)(identity)
      val boxed = idx.map(Integer.valueOf)
      java.util.Arrays.sort(boxed, (a: Integer, b: Integer) =>
        sqlCompare(xs(a), xs(b)))
      boxed.map(_.intValue())
    }
    private val sorted: Array[Double] = order.map(xs)
    // diff(i): weight added to sorted thresholds [0, i) — i.e. all
    // thresholds strictly below the value.
    private val diff = new Array[Long](xs.length + 1)
    private val direct = new Array[Long](xs.length)
    private var finished = false
    private lazy val out: Array[Long] = {
      finished = true
      val pref = new Array[Long](xs.length)
      var run = 0L
      var i = xs.length - 1
      while (i >= 0) {
        run += diff(i + 1)
        pref(i) = run
        i -= 1
      }
      // pref(i) (sorted order) = sum of diff(j+1) for j >= i: every value
      // that cleared sorted threshold i also cleared the smaller ones —
      // accumulate from the top down.
      val res = new Array[Long](xs.length)
      i = 0
      while (i < xs.length) {
        res(order(i)) = pref(i) + direct(order(i))
        i += 1
      }
      res
    }
    def counts: Array[Long] = out

    /** Number of sorted thresholds strictly below d (SQL order). */
    private def below(d: Double): Int = {
      var lo = 0
      var hi = sorted.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (sqlCompare(d, sorted(mid)) > 0) lo = mid + 1 else hi = mid
      }
      lo
    }

    override def addConstant(v: Float, n: Int, at: Int): Unit = {
      require(!finished)
      diff(below(v.toDouble)) += n.toLong
    }

    override def addValue(v: Float, at: Int): Unit = {
      require(!finished)
      diff(below(v.toDouble)) += 1L
    }

    override def addMonotone(eval: Int => Float, from: Int, until: Int): Unit = {
      require(!finished)
      var i = 0
      while (i < xs.length) {
        direct(i) += (until - from -
          monotoneCountLE(xs(i), eval, from, until)).toLong
        i += 1
      }
    }
  }

  /** Index window [from, until) (packed (from << 32) | until) of the
    * segment's timestamps inside [tsLo, tsHi]. Regular segments answer in
    * O(1) arithmetic; irregular ones binary-search the decoded timestamps
    * supplied by `decoded` (invoked at most once).
    */
  private def indexWindow(tsLo: Long, tsHi: Long, st: Long, et: Long,
      tsBytes: Array[Byte], totalLen: Int,
      decoded: () => LongBuf): Long = {
    def pack(from: Int, until: Int): Long =
      (from.toLong << 32) | (until.toLong & 0xffffffffL)
    if (tsLo == Long.MinValue && tsHi == Long.MaxValue)
      return pack(0, totalLen)
    if (tsLo > tsHi) return pack(0, 0)
    if (totalLen <= 2 || tsBytes.isEmpty) {
      // One or two points at st (and et): membership checked directly.
      val first = st >= tsLo && st <= tsHi
      val second = totalLen >= 2 && et >= tsLo && et <= tsHi
      return (first, second) match {
        case (true, true) => pack(0, totalLen)
        case (true, false) => pack(0, 1)
        case (false, true) => pack(totalLen - 1, totalLen)
        case (false, false) => pack(0, 0)
      }
    }
    if (TimestampCodec.areCompressedTimestampsRegular(tsBytes)) {
      val interval = (et - st) / (totalLen - 1)
      if (interval == 0L) {
        // A run of identical timestamps: all in or all out.
        return if (st >= tsLo && st <= tsHi) pack(0, totalLen) else pack(0, 0)
      }
      // First i with st + i*interval >= tsLo, first i with > tsHi.
      val from =
        if (tsLo == Long.MinValue) 0
        else if (tsLo <= st) 0
        else {
          val d = tsLo - st
          val q = d / interval
          math.min(totalLen.toLong, if (q * interval >= d) q else q + 1).toInt
        }
      val until =
        if (tsHi == Long.MaxValue) totalLen
        else if (tsHi < st) 0
        else math.min(totalLen.toLong, (tsHi - st) / interval + 1).toInt
      pack(math.min(from, until), until)
    } else {
      val buf = decoded()
      val b = buf.backing
      val n = buf.length
      // Timestamps are sorted non-decreasing.
      var lo = 0
      var hi = n
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (b(m) < tsLo) lo = m + 1 else hi = m
      }
      val from = lo
      lo = from; hi = n
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (b(m) <= tsHi) lo = m + 1 else hi = m
      }
      pack(from, lo)
    }
  }

  private def traverse(tsLo: Long, tsHi: Long, mt: Byte, st: Long, et: Long,
      tsBytes: Array[Byte], mn: Float, mx: Float, values: Array[Byte],
      residuals: Array[Byte], acc: Acc): Unit = {
    val resLen = Models.residualsLength(residuals)
    val totalLen = TimestampCodec.len(st, et, tsBytes)
    val modelLen = totalLen - resLen

    var tsBuf: LongBuf = null
    def decoded(): LongBuf = {
      if (tsBuf == null) {
        tsBuf = new LongBuf(math.max(totalLen, 16))
        TimestampCodec.decompressAllTimestamps(st, et, tsBytes, tsBuf)
      }
      tsBuf
    }
    def tsAt(i: Int): Long =
      if (tsBytes.isEmpty) { if (i == 0) st else et }
      else if (TimestampCodec.areCompressedTimestampsRegular(tsBytes)) {
        val interval = (et - st) / (totalLen - 1)
        st + i.toLong * interval
      } else decoded()(i)

    val w = indexWindow(tsLo, tsHi, st, et, tsBytes, totalLen, () => decoded())
    val wFrom = (w >>> 32).toInt
    val wUntil = (w & 0xffffffffL).toInt
    if (wUntil <= wFrom) return

    val mFrom = math.min(wFrom, modelLen)
    val mUntil = math.min(wUntil, modelLen)
    var modelLast = 0.0f
    val needModelLast = resLen > 0

    (mt: Int) match {
      case 0 =>
        val c = Models.decodeValuesForPmcMean(mn, mx, values)
        if (mUntil > mFrom) acc.addConstant(c, mUntil - mFrom, mFrom)
        modelLast = c
      case 1 =>
        // Exactly Models.grid's evaluation: slope/intercept from the model
        // endpoints with the model's LAST timestamp (residuals excluded),
        // each value double-evaluated then rounded to float.
        val (fv, lv) = Models.decodeValuesForSwing(mn, mx, values)
        val modelEndTime = if (modelLen <= 0) st else tsAt(modelLen - 1)
        val si = Swing.computeSlopeAndIntercept(
          st, fv.toDouble, modelEndTime, lv.toDouble)
        val slope = si._1
        val intercept = si._2
        def evalAt(i: Int): Float = (slope * tsAt(i) + intercept).toFloat
        if (mUntil > mFrom) acc.addMonotone(evalAt, mFrom, mUntil)
        if (needModelLast && modelLen > 0) modelLast = evalAt(modelLen - 1)
      case 2 =>
        // Values-only walk; the window membership is an index check.
        val vb = new FloatBuf(math.max(modelLen, 16))
        MacaqueV.grid(values, modelLen, vb, hasModelLastValue = false, 0.0f)
        var i = mFrom
        while (i < mUntil) { acc.addValue(vb(i), i); i += 1 }
        if (needModelLast && modelLen > 0) modelLast = vb(modelLen - 1)
      case other =>
        throw new IllegalArgumentException(s"Unknown model type $other.")
    }

    if (resLen > 0) {
      val rFrom = math.max(wFrom - modelLen, 0)
      val rUntil = wUntil - modelLen
      if (rUntil > rFrom) {
        val rb = new FloatBuf(resLen + 1)
        MacaqueV.grid(
          java.util.Arrays.copyOfRange(residuals, 0, residuals.length - 1),
          resLen, rb, hasModelLastValue = true, modelLast)
        var j = rFrom
        while (j < rUntil) { acc.addValue(rb(j), modelLen + j); j += 1 }
      }
    }
  }
}
