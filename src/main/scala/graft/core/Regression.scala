package graft.core

/** Per-segment partial sums for least-squares trend / correlation of a
  * field against time: (count, Σt', Σt'², Σv, Σv², Σv·t') with
  * t' = t - t0, over points whose timestamp lies in [tsLo, tsHi] — one
  * decode pass per segment, merged by a plain aggregation, so the
  * regression never materializes a point stream through the plan.
  * Centering by a caller-chosen epoch t0 keeps t'² within f64's exact
  * integer range for realistic windows and kills most of the
  * cancellation in n·Σvt − Σt·Σv.
  */
object Regression {

  /** Array of (n, Σt', Σt'², Σv, Σv², Σv·t') as doubles (n included so a
    * single array column carries everything; it is integral).
    */
  def sums(t0: Long, tsLo: Long, tsHi: Long,
      mt: Byte, st: Long, et: Long, tsBytes: Array[Byte],
      mn: Float, mx: Float, values: Array[Byte],
      residuals: Array[Byte]): Array[Double] = {
    val ts = new LongBuf(128)
    val vs = new FloatBuf(128)
    Models.grid(mt, st, et, tsBytes, mn, mx, values, residuals, ts, vs)
    var n = 0L
    var s1 = 0.0
    var s2 = 0.0
    var sv = 0.0
    var svv = 0.0
    var svt = 0.0
    var i = 0
    while (i < ts.length) {
      val t = ts(i)
      if (t >= tsLo && t <= tsHi) {
        val tc = (t - t0).toDouble
        val v = vs(i).toDouble
        n += 1L
        s1 += tc
        s2 += tc * tc
        sv += v
        svv += v * v
        svt += v * tc
      }
      i += 1
    }
    Array(n.toDouble, s1, s2, sv, svv, svt)
  }
}
