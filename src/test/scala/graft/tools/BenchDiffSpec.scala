package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The dispersion-aware bench gate must catch a planted regression (the
  * sleep-injection class: one query suddenly slower than its committed
  * band), stay silent on in-band noise, and surface failures and
  * unexplained speedups.
  */
class BenchDiffSpec extends AnyFunSuite {

  test("a planted 2x slowdown is flagged; in-band noise is not") {
    val committed = Map(
      "q_fast" -> (0.50, 0.45, 0.60),
      "q_noisy" -> (2.00, 1.50, 3.10),
      "q_slow" -> (5.00, 4.80, 5.30))
    // q_slow regresses 2x (a planted sleep); q_noisy lands high but
    // INSIDE its committed band x 1.2; q_fast sits at its median.
    val fresh = Map("q_fast" -> 0.52, "q_noisy" -> 3.60, "q_slow" -> 10.6)
    val findings = BenchDiff.flag(committed, fresh)
    assert(findings.map(_.name) == Seq("q_slow"))
    val f = findings.head
    assert(f.kind == "slower" && f.ratio > 1.9 && f.ratio < 2.1)
  }

  test("failures and unexplained speedups surface; only regressions gate") {
    val committed = Map(
      "q_broken" -> (1.00, 0.90, 1.10),
      "q_sped" -> (4.00, 3.80, 4.20))
    val fresh = Map("q_broken" -> -1.0, "q_sped" -> 1.0)
    val findings = BenchDiff.flag(committed, fresh)
    assert(findings.map(f => (f.name, f.kind)).toSet ==
      Set(("q_broken", "failed"), ("q_sped", "faster")))
    // Ranking: the failure (infinite ratio) outranks the speedup.
    assert(findings.head.name == "q_broken")
  }

  test("legacy maps without dispersion collapse the band to the median") {
    val committed = Map("q" -> (1.00, 1.00, 1.00))
    assert(BenchDiff.flag(committed, Map("q" -> 1.15)).isEmpty) // 1.2x gate
    assert(BenchDiff.flag(committed, Map("q" -> 1.25)).nonEmpty)
  }

  test("file-level diff parses the BENCH_LOCAL format end to end") {
    val oldLine = """{"metric":"total","value":7.0,"unit":"sec","queries":{"a":1.000,"b":2.000,"c":4.000},"dispersion":{"a":[0.900,1.100],"b":[1.800,2.500]},"sf":"x","commit":"abc"}"""
    val newLine = """{"metric":"total","value":9.9,"unit":"sec","queries":{"a":1.050,"b":5.900,"c":4.100},"sf":"x"}"""
    val old = BenchDiff.parse(oldLine)
    assert(old("a") == ((1.0, 0.9, 1.1)) && old("c") == ((4.0, 4.0, 4.0)))
    val findings = BenchDiff.flag(old,
      BenchDiff.parse(newLine).map { case (k, (m, _, _)) => k -> m })
    // b regressed past 2.5 * 1.2; a and c ride inside their bands.
    assert(findings.map(_.name) == Seq("b"))
    assert(BenchDiff.render(findings).contains("b"))
    assert(BenchDiff.render(Seq.empty).contains("inside their committed"))
  }
}
