package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout contract under a BOUNDED-TAIL capture (VERDICT r17
  * item 8): the round-16 artifact lost its bench line because the
  * consumer retained only a tail of stdout and the line was cut mid-way.
  * The contract this spec pins: a consumer that keeps the LAST 4 KiB of
  * stdout — even with sbt's end-of-run trailer after the program's
  * output — still holds one COMPLETE final JSON line covering the WHOLE
  * query registry at worst-case numeric widths.
  */
class BenchLineSpec extends AnyFunSuite {

  private val TailBytes = 4096

  test("final bench line for the full registry parses from a 4 KiB stdout tail") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.size >= 124, "registry unexpectedly small")
    // Worst-case widths: fmt() prints %.3f, so three digits before the
    // point is the realistic per-query maximum.
    val line = Bench.jsonLine(names.map(_ -> 999.999))
    // sbt passes program stdout through and then appends its own trailer;
    // keep a generous allowance for it inside the same 4 KiB window.
    val trailer = "\n[success] Total time: 9999 s (02:46:39), " +
      "completed Aug 18, 2026, 11:59:59 PM\n"
    assert(line.length + trailer.length <= TailBytes,
      s"bench line (${line.length} B) + trailer no longer fits a " +
        s"$TailBytes-byte tail — shrink the line or drop the contract")

    // Simulated full stdout: the per-child cumulative lines (each child
    // emits the running map), the final line, the sbt trailer.
    val cumulative = (1 to names.size by 17).map(k =>
      Bench.jsonLine(names.take(k).map(_ -> 999.999)))
    val stdout = cumulative.mkString("", "\n", "\n") + line + trailer
    val tail = stdout.substring(math.max(0, stdout.length - TailBytes))

    // The r16 failure mode: parse the LAST complete JSON line from the
    // tail, exactly as a bounded-capture consumer must.
    val lastComplete = tail.split('\n')
      .filter(l => l.startsWith("{\"metric\"") && l.endsWith("}"))
      .lastOption
    assert(lastComplete.nonEmpty, "no complete JSON line in the 4 KiB tail")
    val parsed = lastComplete.get
    names.foreach { n =>
      val re = ("\"" + java.util.regex.Pattern.quote(n) +
        "\":(-?[0-9.eE+]+)").r
      val m = re.findFirstMatchIn(parsed)
      assert(m.nonEmpty, s"query $n missing from the tail-parsed line")
      assert(m.get.group(1).toDouble == 999.999)
    }
  }
}
