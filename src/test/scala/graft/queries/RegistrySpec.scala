package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.tsdb.SparkTestSession

/** Full-registry smoke gate: every entry in `SparkEntry.queries` must at
  * least analyze, plan, and produce a row batch at sf0.001. A fixture or
  * schema break (e.g. a testdata regeneration changing events.ts's physical
  * type) that throws at read time fails HERE, in `sbt test`, instead of
  * silently wiping the driver's correctness rows — round 11 lost 33/72
  * registered queries to exactly that class of break with a green build.
  *
  * One ScalaTest test per query so a single throw can't hide the rest.
  */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("every oracled name is a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracleSql names without a query: $unknown")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).limit(1).collect().nonEmpty)
  }

  for ((name, fn) <- SparkEntry.queries)
    test(s"registry smoke: $name") {
      // limit(1) keeps the run cheap while still forcing analysis,
      // physical planning, and at least one task of real execution.
      fn(spark, sfDir).limit(1).collect()
    }
}
