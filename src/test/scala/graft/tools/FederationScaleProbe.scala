package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tsdb.{Engine, FederatedAggregate, RankProbe}

/** Federated MERGE at high group cardinality over a live RemoteServer:
  * drives ~N groups × 2 rank states per group through the rank search's
  * generic (VALUES-text) transport and reports statement sizes, per-round
  * wall time and heap — the O(states) statement rendering confirmed
  * parse-safe and time-bounded at the next order of magnitude above the
  * spec-level chunking test (4,100 groups).
  *
  * The per-group row count stays SMALL (the build must not dominate the
  * probe); [[FederatedAggregate.QuantileFetchGap]] is lowered instead so
  * the search runs real bisection rounds rather than jumping straight to
  * the bounded fetch — the round machinery (threshold rendering, VALUES
  * join, chunked statements, per-round merge) is identical to what 10^3
  * points per group would exercise, at tool-runtime cost O(groups).
  *
  * Usage: `sbt 'Test/runMain graft.tools.FederationScaleProbe [groups]'`
  * (default 50,000 groups → 100k+ rank states, 13+ chunked statements
  * per round at the 8,192-state cap).
  */
object FederationScaleProbe {
  def main(args: Array[String]): Unit = {
    val groups = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def build(seed: Int): Engine = {
      val e = new Engine(spark,
        Files.createTempDirectory("graft_fedscale").toString)
      e.sql("CREATE TABLE wt(g INT, x DOUBLE)")
      val rng = new scala.util.Random(seed)
      e.write("wt", (0 until groups).flatMap(g =>
        (0 until 12).map(_ => (g, rng.nextDouble() * 1000 - 500)))
        .toDF("g", "x"))
      e
    }
    val local = build(1)
    val remote = build(2)

    // Statement log: (arrivalNanos, bytes, kind).
    val log = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, String)]()
    def kindOf(s: String): String =
      if (s.contains("__p0")) "partial"
      else if (RankProbe.matches(s)) "segment-probe"
      else if (s.contains("count_if")) "probe"
      else if (s.contains("__v")) "fetch"
      else "other"
    val server = new graft.remote.RemoteServer(remote,
      onStatement = s => log.add((System.nanoTime(), s.length, kindOf(s))))

    val rt = Runtime.getRuntime
    def usedMb(): Long = {
      System.gc()
      (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
    }
    val heapBefore = usedMb()
    val savedGap = FederatedAggregate.QuantileFetchGap
    FederatedAggregate.QuantileFetchGap = 8L // force real bisection rounds
    try {
      val t0 = System.nanoTime()
      val got = local.sql(s"INCLUDE MERGE '${server.address}' " +
        "SELECT g, percentile(x, 0.73) AS p FROM wt GROUP BY g")
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val wallSec = (System.nanoTime() - t0) / 1e9
      val heapAfter = usedMb()

      // Exactness over every group vs the combined data.
      local.readTable("wt").unionByName(remote.readTable("wt"))
        .createOrReplaceTempView("__fed_scale")
      val want = spark.sql(
        "SELECT g, percentile(x, 0.73) AS p FROM __fed_scale GROUP BY g")
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      require(got.size == groups && got.keySet == want.keySet,
        s"group count ${got.size} != $groups")
      var worst = 0.0
      want.foreach { case (g, w) =>
        worst = math.max(worst, math.abs(got(g) - w))
      }
      require(worst == 0.0, s"exactness: worst abs diff $worst")

      // Per-kind statement stats; rounds = bursts of equal-kind chunks.
      import scala.jdk.CollectionConverters._
      val entries = log.asScala.toSeq.sortBy(_._1)
      val byKind = entries.groupBy(_._3)
      val summary = byKind.toSeq.sortBy(_._1).map { case (kind, es) =>
        s"$kind: n=${es.size} maxBytes=${es.map(_._2).max} " +
          s"totBytes=${es.map(_._2.toLong).sum}"
      }.mkString("; ")
      val rounds = entries.foldLeft(Seq.empty[(String, Int)]) {
        case (acc, (_, _, k)) =>
          if (acc.nonEmpty && acc.last._1 == k)
            acc.init :+ (k, acc.last._2 + 1)
          else acc :+ (k, 1)
      }
      println(s"[fed-scale] groups=$groups states=${2 * groups}(approx) " +
        f"wall=$wallSec%.1fs heapMB=$heapBefore->$heapAfter")
      println(s"[fed-scale] statements: $summary")
      println(s"[fed-scale] round bursts: ${rounds.map { case (k, n) =>
        s"$k x$n" }.mkString(", ")}")
      println(s"[fed-scale] exact on all $groups groups: true")
    } finally {
      FederatedAggregate.QuantileFetchGap = savedGap
      server.close()
      spark.stop()
    }
  }
}
