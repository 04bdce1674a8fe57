package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.tsdb.SparkTestSession

/** Registry-level checks that are not SQL-oracled: the approximate
  * percentile variant must track the exact one within the sketch's
  * documented rank-error bound.
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("approx percentiles track exact percentiles per group") {
    val exact = SparkEntry.queries("q20_percentiles")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val approx = SparkEntry.queries("q20_percentiles_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    // accuracy=10000 => rank error <= n/10000 (< 1 row at this scale); the
    // sketch returns a real element while percentile() interpolates, so
    // allow the one-element gap — generous at 2% relative.
    exact.foreach { case (status, (p25, p50, p90)) =>
      val (a25, a50, a90) = approx(status)
      def close(a: Double, e: Double) =
        math.abs(a - e) <= math.abs(e) * 0.02
      assert(close(a25, p25) && close(a50, p50) && close(a90, p90),
        s"approx percentiles for $status drifted: " +
          s"($a25,$a50,$a90) vs ($p25,$p50,$p90)")
    }
  }

  test("approx distinct counts track exact counts within the HLL rsd") {
    val exact = SparkEntry.queries("q11_distinct_counts")(spark, sfDir)
      .collect().head
    val approx = SparkEntry.queries("q11_distinct_counts_approx")(spark, sfDir)
      .collect().head
    assert(exact.schema.fieldNames.toSeq == approx.schema.fieldNames.toSeq)
    // rsd = 2%; allow 4 standard deviations so the test never flakes on
    // an unlucky sketch while still catching a broken estimator (at the
    // spec's small cardinalities HLL++ bias correction / linear counting
    // keeps the real error well under the nominal rsd anyway).
    (0 until 3).foreach { i =>
      val e = exact.getLong(i).toDouble
      val a = approx.getLong(i).toDouble
      assert(math.abs(a - e) <= e * 0.08,
        s"${exact.schema.fieldNames(i)}: approx $a vs exact $e")
    }
    assert(exact.getLong(3) == approx.getLong(3), "n_rows is exact in both")
  }
}
