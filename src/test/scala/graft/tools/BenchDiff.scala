package graft.tools

/** Dispersion-aware bench regression gate.
  *
  * `BENCH_LOCAL.json` carries, for every query, the median of three timed
  * runs AND the `[min, max]` dispersion of those runs — the same-binary
  * noise band any cross-round comparison must clear. This tool diffs a
  * freshly measured map against a committed one and flags ONLY queries
  * whose new median falls outside the committed band by more than the
  * gate factor (default 1.2×): a query can be 30% "slower" than the old
  * MEDIAN and still be inside its own recorded noise, while a genuine
  * regression clears the recorded MAX with margin. Turns driver-run
  * outlier triage into reading one ranked table.
  *
  * Usage (Test scope):
  * {{{
  *   sbt 'Test/runMain graft.tools.BenchDiff <new.json> [old.json] [gate]'
  * }}}
  * `old.json` defaults to the committed `BENCH_LOCAL.json`; `gate`
  * defaults to 1.2. Exit code 1 when regressions are flagged (CI-able).
  */
object BenchDiff {

  /** One query's verdict: ratio of new median to the committed band edge
    * it violates (>1 regression against max, <1 improvement against min).
    */
  final case class Finding(
      name: String, oldMedian: Double, oldMin: Double, oldMax: Double,
      newMedian: Double, ratio: Double, kind: String)

  /** Pure gate: flag queries whose new median leaves the committed
    * [min, max] band by more than `gate`×. `old` maps name ->
    * (median, min, max); absent dispersion collapses the band to the
    * median (strictest, correct for legacy maps). Improvements are
    * reported too (kind = "faster") — a big unexplained speedup is a
    * broken query as often as a win — but only regressions gate.
    */
  def flag(old: Map[String, (Double, Double, Double)],
      fresh: Map[String, Double], gate: Double = 1.2): Seq[Finding] = {
    require(gate >= 1.0, "gate must be >= 1")
    fresh.toSeq.sortBy(_._1).flatMap { case (name, nm) =>
      old.get(name).flatMap { case (om, omin, omax) =>
        if (nm < 0 && om >= 0)
          Some(Finding(name, om, omin, omax, nm, Double.PositiveInfinity,
            "failed"))
        else if (nm < 0 || om < 0) scala.None
        else if (nm > omax * gate)
          Some(Finding(name, om, omin, omax, nm, nm / omax, "slower"))
        else if (nm * gate < omin)
          Some(Finding(name, om, omin, omax, nm, nm / omin, "faster"))
        else scala.None
      }
    }.sortBy(f => -math.max(f.ratio, 1.0 / math.max(f.ratio, 1e-12)))
  }

  /** Parse one BENCH_LOCAL-format line/file into (median, min, max) per
    * query. Dispersion is optional per query (the band collapses to the
    * median). Hand-rolled extraction, mirroring how the bench supervisor
    * parses child lines — the format is this repo's own single-line JSON.
    */
  def parse(text: String): Map[String, (Double, Double, Double)] = {
    def section(key: String): Option[String] = {
      val start = text.indexOf("\"" + key + "\":{")
      if (start < 0) scala.None
      else {
        val open = text.indexOf('{', start)
        val close = text.indexOf('}', open)
        if (close < 0) scala.None else Some(text.substring(open + 1, close))
      }
    }
    val num = "(-?[0-9.eE+]+)"
    val qRe = ("\"([^\"]+)\":" + num).r
    val medians = section("queries").map { body =>
      qRe.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble)
        .toMap
    }.getOrElse(Map.empty)
    val dRe = ("\"([^\"]+)\":\\[" + num + "," + num + "\\]").r
    val bands = section("dispersion").map { body =>
      dRe.findAllMatchIn(body)
        .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble))
        .toMap
    }.getOrElse(Map.empty)
    medians.map { case (name, med) =>
      val (mn, mx) = bands.getOrElse(name, (med, med))
      name -> (med, mn, mx)
    }
  }

  def render(findings: Seq[Finding]): String = {
    if (findings.isEmpty) "bench-diff: all queries inside their committed dispersion bands"
    else {
      val rows = findings.map { f =>
        f"${f.kind}%-7s ${f.name}%-34s new=${f.newMedian}%8.3f  " +
          f"committed=${f.oldMedian}%8.3f [${f.oldMin}%.3f, ${f.oldMax}%.3f]  " +
          f"ratio=${f.ratio}%.2fx"
      }
      ("bench-diff: " + findings.count(f => f.kind != "faster") +
        " regression(s), " + findings.count(_.kind == "faster") +
        " unexplained speedup(s)") +: rows
    }.mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: BenchDiff <new.json> [old.json=BENCH_LOCAL.json] [gate=1.2]")
    val newMap = parse(java.nio.file.Files.readString(
      java.nio.file.Paths.get(args(0))))
    val oldPath = if (args.length > 1) args(1) else "BENCH_LOCAL.json"
    val oldMap = parse(java.nio.file.Files.readString(
      java.nio.file.Paths.get(oldPath)))
    val gate = if (args.length > 2) args(2).toDouble else 1.2
    val findings = flag(oldMap, newMap.map { case (k, (m, _, _)) => k -> m },
      gate)
    println(render(findings))
    if (findings.exists(_.kind != "faster")) sys.exit(1)
  }
}
