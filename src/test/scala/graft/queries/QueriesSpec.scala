package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.tsdb.SparkTestSession

/** Registry-level checks for the self-gating approximate variants: each
  * emits booleans proving its sketch tracks the exact twin (computed in
  * the same aggregation), which the SQL oracle then pins to TRUE — these
  * specs assert the same gates hold at the spec scale factor.
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("approx percentiles land inside the exact percentile band per group") {
    val rows = SparkEntry.queries("q20_percentiles_approx")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
        s"approx percentiles for ${r.getString(0)} left the p±0.005 band")
    }
    // The gate keys must be the same groups the exact query reports.
    val exactKeys = SparkEntry.queries("q20_percentiles")(spark, sfDir)
      .collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet == exactKeys)
  }

  test("approx distinct counts gate within 2x rsd and keep n_rows exact") {
    val exact = SparkEntry.queries("q11_distinct_counts")(spark, sfDir)
      .collect().head
    val approx = SparkEntry.queries("q11_distinct_counts_approx")(spark, sfDir)
      .collect().head
    assert(approx.getBoolean(0), "n_parts estimate outside 2x rsd")
    assert(approx.getBoolean(1), "n_suppliers estimate outside 2x rsd")
    assert(approx.getBoolean(2), "n_orders estimate outside 2x rsd")
    assert(approx.getLong(3) == exact.getLong(3), "n_rows is exact in both")
  }
}
