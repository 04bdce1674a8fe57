package graft.remote

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.DataGeneration
import graft.tsdb.{Engine, FederatedAggregate, SparkTestSession}

/** Metamorphic fuzz harness for [[FederatedAggregate]]: the INCLUDE MERGE
  * decomposer re-implements Spark's partial/merge split by hand, and the
  * only property every accepted shape must satisfy is MERGE ≡ RE-AGGREGATE
  * — the merged result equals the same statement evaluated over the union
  * of every endpoint's raw points (the reference's federation contract,
  * /root/reference/crates/modelardb_server/src/remote.rs:88-165, lifted
  * from row-union to combined-data semantics).
  *
  * A seeded generator composes random legal shapes — count/sum/min/max/avg
  * × the variance family × exact percentiles (cont, disc, median, DESC
  * mirror) × scalar post-processing × 0-2 grouping expressions × time/tag/
  * value predicates × 1-2 endpoints with overlapping and disjoint tag sets
  * — and every seed asserts equivalence against `spark.sql` over the
  * combined raw view. Planted-mutation tests prove both a dropped partial
  * frame and an off-by-one rank target are actually caught, and dedicated
  * seeds hit every rejection branch.
  *
  * Folder endpoints keep the fuzz in-process; the TCP/Arrow remote path is
  * covered by [[IncludeMergeSpec]] and `ts_include_*`.
  */
class FederatedMergeFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** One engine per endpoint: distinct value streams per tag; the local
    * engine's "c" tag carries NaN runs (merge must propagate them the way
    * Spark does over the combined data).
    */
  private def makeEngine(tags: Seq[String], n: Int, nanTag: Option[String])
      : Engine = {
    val engine = new Engine(spark,
      Files.createTempDirectory("graft_fmfuzz").toString)
    engine.sql("CREATE TIME SERIES TABLE mts(ts TIMESTAMP, v FIELD, tag TAG)")
    import spark.implicits._
    tags.foreach { tag =>
      val rng = new scala.util.Random(tag.hashCode * 7919L + n)
      val ts = DataGeneration.generateTimestamps(n, irregular = true, rng)
      val vs = new Array[Float](n)
      var i = 0
      while (i < n) {
        val run = math.min(n - i, 30 + rng.nextInt(50))
        val vals = (rng.nextInt(8): @unchecked) match {
          case 0 | 1 => DataGeneration.generateValues(run,
            DataGeneration.Constant, None, rng)
          case 2 | 3 => DataGeneration.generateValues(run,
            DataGeneration.Linear, Some(0.3f), rng)
          case 4 | 5 | 6 => DataGeneration.generateValues(run,
            DataGeneration.RandomValues(-90f, 90f), None, rng)
          case 7 =>
            if (nanTag.contains(tag)) Array.fill(run)(Float.NaN)
            else DataGeneration.generateValues(run,
              DataGeneration.RandomValues(0f, 50f), None, rng)
        }
        System.arraycopy(vals, 0, vs, i, run)
        i += run
      }
      engine.write("mts", ts.indices.map(i => (ts(i), vs(i), tag))
        .toDF("ts", "v", "tag"))
    }
    engine
  }

  // local shares tag "b" with endpoint 1 and nothing with endpoint 2 —
  // merged groups span one, two, and three endpoints.
  private lazy val local = makeEngine(Seq("a", "b", "c"), 260, Some("c"))
  private lazy val ep1 = makeEngine(Seq("b", "d"), 220, None)
  private lazy val ep2 = makeEngine(Seq("a", "e"), 180, None)

  private lazy val fixture: Unit = {
    local.readTable("mts").unionByName(ep1.readTable("mts"))
      .createOrReplaceTempView("__fm_c1")
    local.readTable("mts").unionByName(ep1.readTable("mts"))
      .unionByName(ep2.readTable("mts"))
      .createOrReplaceTempView("__fm_c2")
  }

  private lazy val (tsMin, tsMax) = {
    val r = local.readTable("mts")
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect().head
    (r.getLong(0), r.getLong(1))
  }

  private def fmtTs(us: Long): String = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    .format(java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))

  /** One random legal statement:
    * (select, numberOfGroupKeyColumns, numberOfEndpoints, hasPercentile).
    */
  private def genQuery(seed: Int): (String, Int, Int, Boolean) = {
    val rng = new scala.util.Random(seed * 1099511628211L + 31)
    def pick[T](xs: Seq[T]): T = xs(rng.nextInt(xs.length))
    val endpoints = 1 + rng.nextInt(2)
    val percentileSeed = rng.nextDouble() < 0.2

    val groupings: Seq[(String, String)] = rng.nextInt(8) match {
      case 0 | 1 => Seq.empty
      case 2 | 3 | 4 => Seq(("tag", "tag"))
      case 5 =>
        val u = pick(Seq("HOUR", "DAY"))
        Seq((s"date_trunc('$u', ts) AS b", s"date_trunc('$u', ts)"))
      case 6 => Seq(("floor(v / 40.0) AS bin", "floor(v / 40.0)"))
      case 7 => Seq(("tag", "tag"), ("hour(ts) AS ph", "hour(ts)"))
    }

    val where = scala.collection.mutable.ArrayBuffer.empty[String]
    if (rng.nextDouble() < 0.35) {
      val a = tsMin + (rng.nextDouble() * (tsMax - tsMin)).toLong
      val b = tsMin + (rng.nextDouble() * (tsMax - tsMin)).toLong
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      where += s"ts >= TIMESTAMP '${fmtTs(lo)}' AND ts <= TIMESTAMP '${fmtTs(hi)}'"
    }
    if (rng.nextDouble() < 0.3)
      where += pick(Seq("tag <> 'e'", "tag IN ('a', 'b', 'd')", "tag >= 'b'"))
    if (rng.nextDouble() < 0.25) {
      val c = -60.0 + rng.nextDouble() * 120.0
      where += pick(Seq(s"v > $c", s"v <= $c", f"v > $c%.3f AND v <= ${c + 45.0}%.3f"))
    }
    // The rank search rejects NaN-containing percentile inputs by design —
    // percentile seeds filter them the way a federation user would.
    if (percentileSeed) where += "NOT isnan(v)"

    val aggs: Seq[String] =
      if (percentileSeed) {
        val pcts = Seq("0.0", "0.1", "0.25", "0.5", "0.9", "0.99", "1.0")
        val pool = Seq(
          () => s"percentile(v, ${pick(pcts)})",
          () => s"percentile(v, array(${pick(pcts)}, ${pick(pcts)}, " +
            s"${pick(pcts)}))",
          () => "median(v)",
          () => s"percentile_cont(${pick(pcts)}) WITHIN GROUP (ORDER BY v)",
          () => s"percentile_cont(${pick(pcts)}) WITHIN GROUP (ORDER BY v DESC)",
          () => s"percentile_disc(${pick(pcts)}) WITHIN GROUP (ORDER BY v)",
          // percentiles mix with algebraic calls in one statement
          () => "count(*)", () => "avg(v)", () => "max(v) - min(v)")
        Seq.fill(1 + rng.nextInt(3))(pick(pool)()).distinct
          .zipWithIndex.map { case (a, i) => s"$a AS p$i" }
      } else {
        val pool = Seq(
          "count(*)", "count(v)", "sum(v)", "avg(v)", "min(v)", "max(v)",
          "var_samp(v)", "var_pop(v)", "stddev_samp(v)", "stddev_pop(v)",
          "min(ts)", "max(ts)", "sum(v * 0.5 + 8.0)", "avg(v * 2.0 - 1.0)",
          "round(avg(v), 3)", "max(v) - min(v)", "count(*) + 1",
          "sum(v) / count(*)")
        Seq.fill(1 + rng.nextInt(3))(pick(pool)).distinct
          .zipWithIndex.map { case (a, i) => s"$a AS a$i" }
      }

    val selectCols = (groupings.map(_._1) ++ aggs).mkString(", ")
    val whereSql = if (where.isEmpty) "" else where.mkString(" WHERE ", " AND ", "")
    val groupSql =
      if (groupings.isEmpty) ""
      else groupings.map(_._2).mkString(" GROUP BY ", ", ", "")

    // Answer-sized post-processing trailers: HAVING (also over aggregates
    // the select list does NOT carry), total-order ORDER BY + LIMIT (all
    // group expressions ride as tiebreaks so row selection is
    // deterministic on both sides), and OFFSET pagination. These replay
    // locally on the merged frame — the equivalence target is the SAME
    // statement over the combined view, row ORDER included.
    val aliases = aggs.map(_.split(" AS ").last)
    // Tiebreaks reference the select-list ALIASES: a grouping expression
    // like floor(v / 40.0) cannot re-resolve above a HAVING's stripping
    // Project (Spark's own resolution rule), and the alias always can.
    val keyTie = groupings.map(_._1.split(" AS ").last).mkString(", ")
    def orderTrailer(withOffset: Boolean): String = {
      val dir = if (rng.nextBoolean()) "DESC" else "ASC"
      val tie = if (keyTie.isEmpty) "" else s", $keyTie"
      s" ORDER BY ${pick(aliases)} $dir$tie LIMIT ${1 + rng.nextInt(6)}" +
        (if (withOffset) s" OFFSET ${rng.nextInt(3)}" else "")
    }
    val trailer = rng.nextInt(10) match {
      case 0 | 1 if groupings.nonEmpty =>
        s" HAVING ${pick(Seq("count(*)", "count(v)", "min(v)"))} > " +
          s"${5 + rng.nextInt(300)}"
      case 2 | 3 => orderTrailer(withOffset = false)
      case 4 if groupings.nonEmpty =>
        s" HAVING count(*) > ${5 + rng.nextInt(150)}" +
          orderTrailer(withOffset = true)
      case _ => ""
    }
    (s"SELECT $selectCols FROM mts$whereSql$groupSql$trailer",
      groupings.length, endpoints, percentileSeed)
  }

  /** merged ≡ spark.sql over the combined raw view, rows matched by their
    * group-key prefix, doubles to 1e-9 relative (partial sums reorder).
    * The SCHEMA must match too: the federation contract is
    * schema-identical to running the statement locally (remote.rs:88-165
    * row-unions schema-identical frames), so every merged column's type
    * is asserted against the local plan's — the guard that caught the
    * decimal sum/avg widening drift.
    */
  private def assertEquivalent(q: String, nKeys: Int, endpoints: Int,
      addresses: Seq[String] = Seq.empty): Unit = {
    fixture
    val addrs =
      (if (addresses.nonEmpty) addresses else Seq(ep1.root, ep2.root))
        .take(endpoints)
    val gotDf = local.sql(
      s"INCLUDE MERGE ${addrs.map(f => s"'$f'").mkString(", ")} $q")
    val combined = if (endpoints == 1) "__fm_c1" else "__fm_c2"
    val wantDf = spark.sql(q.replace("FROM mts", s"FROM $combined"))
    assert(gotDf.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      wantDf.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"schema drift\n$q\nmerged: ${gotDf.schema.sql}\nlocal: ${wantDf.schema.sql}")
    val got = gotDf.collect()
    val want = wantDf.collect()
    def key(r: Row) =
      (0 until nKeys).map(i => String.valueOf(r.get(i))).mkString(" ")
    // ORDER BY seeds carry a TOTAL order (every group expression rides as
    // a tiebreak), so the replayed sort/limit/offset must reproduce the
    // local statement's exact row ORDER — compare in order, no re-sort.
    val ordered = q.contains(" ORDER BY ")
    val g = if (ordered) got else got.sortBy(key)
    val w = if (ordered) want else want.sortBy(key)
    assert(g.length == w.length, s"row count ${g.length} vs ${w.length}\n$q")
    g.zip(w).foreach { case (a, b) =>
      (0 until a.length).foreach { i =>
        (a.get(i), b.get(i)) match {
          case (null, null) =>
          case (x: java.lang.Double, y: java.lang.Double) =>
            assert(x.isNaN && y.isNaN || math.abs(x - y) <=
              math.max(1e-12, 1e-9 * math.max(math.abs(x), math.abs(y))),
              s"col $i: $x vs $y\n$q\nmerged: $a\ncombined: $b")
          case (x: java.lang.Float, y: java.lang.Float) =>
            assert(x.isNaN && y.isNaN ||
              math.abs(x.toDouble - y.toDouble) <= 1e-6 +
                1e-6 * math.max(math.abs(x.toDouble), math.abs(y.toDouble)),
              s"col $i: $x vs $y\n$q\nmerged: $a\ncombined: $b")
          case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
            // Array-percentage results: elementwise double compare.
            assert(x.length == y.length,
              s"col $i: $x vs $y\n$q\nmerged: $a\ncombined: $b")
            x.zip(y).foreach {
              case (p: java.lang.Double, r: java.lang.Double) =>
                assert(p.isNaN && r.isNaN || math.abs(p - r) <=
                  math.max(1e-12, 1e-9 * math.max(math.abs(p), math.abs(r))),
                  s"col $i: $x vs $y\n$q\nmerged: $a\ncombined: $b")
              case (p, r) => assert(p == r,
                s"col $i: $x vs $y\n$q\nmerged: $a\ncombined: $b")
            }
          case (x, y) =>
            assert(x == y, s"col $i: $x vs $y\n$q\nmerged: $a\ncombined: $b")
        }
      }
    }
  }

  test("200 seeded random shapes: INCLUDE MERGE ≡ re-aggregation over the " +
      "combined endpoints' points") {
    var percentileSeeds = 0
    var havingSeeds = 0
    var orderSeeds = 0
    (1 to 200).foreach { seed =>
      val (q, nKeys, endpoints, hasPct) = genQuery(seed)
      if (hasPct) percentileSeeds += 1
      if (q.contains(" HAVING ")) havingSeeds += 1
      if (q.contains(" ORDER BY ")) orderSeeds += 1
      withClue(s"seed $seed: ") { assertEquivalent(q, nKeys, endpoints) }
    }
    // The generator must keep exercising the interactive rank-search path
    // and the merge-then-post-process replay (HAVING / ORDER BY + LIMIT /
    // OFFSET shapes, order-sensitive compare).
    assert(percentileSeeds >= 20,
      s"only $percentileSeeds of 200 seeds exercised percentiles")
    assert(havingSeeds >= 10 && orderSeeds >= 20,
      s"only $havingSeeds HAVING / $orderSeeds ORDER BY seeds of 200 " +
        "exercised the post-processing replay")
  }

  test("55 TCP seeds: endpoints behind live RemoteServers — Arrow " +
      "round-tripping of partial and probe frames under random fire") {
    // The folder seeds keep the fuzz in-process; these replay the same
    // generator with endpoint 1 behind a live RemoteServer (every partial
    // frame, rank-search probe round and bounded fetch ships as Arrow IPC
    // batches), so NaN runs, NULL partials, timestamps and empty groups
    // are under random fire on the wire too — not just IncludeMergeSpec's
    // fixed shapes. Endpoint 2 stays a folder: two-endpoint seeds then
    // also mix transports in ONE statement. (Two in-JVM servers over
    // DIFFERENT engines would race each other's view registration on the
    // shared test session during the concurrent fan-out — a test-session
    // artifact, not a transport property: production endpoints own their
    // sessions.) Five extra sketch seeds push HLL sketch BINARIES through
    // Arrow and must merge to the same estimate the folder path yields.
    fixture
    val server1 = new graft.remote.RemoteServer(ep1)
    try {
      val tcp = Seq(server1.address, ep2.root)
      var percentileSeeds = 0
      (1 to 50).foreach { seed =>
        val (q, nKeys, endpoints, hasPct) = genQuery(seed)
        if (hasPct) percentileSeeds += 1
        withClue(s"tcp seed $seed: ") {
          assertEquivalent(q, nKeys, endpoints, addresses = tcp)
        }
      }
      assert(percentileSeeds >= 5,
        s"only $percentileSeeds of 50 TCP seeds exercised the rank search")
      (1 to 5).foreach { seed =>
        val rng = new scala.util.Random(seed * 48611L + 3)
        val child = Seq("v", "tag", "ts")(rng.nextInt(3))
        val sel = s"SELECT tag, approx_count_distinct($child, 0.02) AS ad " +
          "FROM mts GROUP BY tag"
        val viaTcp = local.sql(s"INCLUDE MERGE '${server1.address}' $sel")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val viaFolder = local.sql(s"INCLUDE MERGE '${ep1.root}' $sel")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        withClue(s"sketch tcp seed $seed [$sel]: ") {
          assert(viaTcp == viaFolder,
            "sketch bytes must survive the Arrow transport losslessly")
        }
      }
    } finally server1.close()
  }

  test("30 probe-forced seeds: a lowered fetch gap makes every percentile " +
      "seed run real bisection rounds on its own path, still exact") {
    // The fixture's groups (a few hundred points) sit under the 1024
    // fetch gap, so ordinary seeds resolve in one bounded fetch and the
    // probe-round machinery (threshold rendering, chunking, per-round
    // merge — on BOTH the generic SQL and GRAFT SEGMENT PROBE paths)
    // only runs in dedicated specs. Lowering the gap forces 2+ real
    // probe rounds per rank state under the same random fire.
    fixture
    val saved = FederatedAggregate.QuantileFetchGap
    val savedGate = FederatedAggregate.NativeProbeMinPoints
    FederatedAggregate.QuantileFetchGap = 16L
    // Gate open: the fixture sits below the production size gate, and
    // these seeds must keep the SEGMENT-NATIVE rounds under random fire.
    FederatedAggregate.NativeProbeMinPoints = 0L
    try {
      var pctSeeds = 0
      (1 to 200).foreach { seed =>
        val (q, nKeys, endpoints, hasPct) = genQuery(seed)
        if (hasPct && pctSeeds < 30) {
          pctSeeds += 1
          withClue(s"probe-forced seed $seed: ") {
            assertEquivalent(q, nKeys, endpoints)
          }
        }
      }
      assert(pctSeeds >= 30, s"generator yielded only $pctSeeds pct seeds")
    } finally {
      FederatedAggregate.QuantileFetchGap = saved
      FederatedAggregate.NativeProbeMinPoints = savedGate
    }
  }

  test("planted dropped-endpoint mutation is caught") {
    // Simulates the wrong-partial-shape bug class: a merge that silently
    // loses one endpoint's partial frame. Seeds whose last endpoint holds
    // data the others don't must flag the mismatch.
    val seeds = (1 to 60).map(genQuery)
    FederatedAggregate.plantDropFrameForTests = true
    try {
      val caught = seeds.exists { case (q, nKeys, endpoints, _) =>
        try { assertEquivalent(q, nKeys, endpoints); false }
        catch { case _: Throwable => true }
      }
      assert(caught, "no seed detected the dropped endpoint frame")
    } finally FederatedAggregate.plantDropFrameForTests = false
    // The harness still passes with the mutation off (no latent state).
    val (q, nKeys, endpoints, _) = genQuery(1)
    assertEquivalent(q, nKeys, endpoints)
  }

  test("planted off-by-one rank target is caught by percentile seeds") {
    val pctSeeds = (1 to 200).map(genQuery).filter(_._4)
    assert(pctSeeds.nonEmpty, "generator produced no percentile seeds")
    FederatedAggregate.plantRankBugForTests = true
    try {
      val caught = pctSeeds.exists { case (q, nKeys, endpoints, _) =>
        try { assertEquivalent(q, nKeys, endpoints); false }
        catch { case _: Throwable => true }
      }
      assert(caught, "no percentile seed detected the rank off-by-one")
    } finally FederatedAggregate.plantRankBugForTests = false
  }

  test("20 travel seeds: MERGE over VERSION AS OF k ≡ re-aggregation over " +
      "the endpoints' own version-k snapshots") {
    fixture
    (1 to 20).foreach { seed =>
      val rng = new scala.util.Random(seed * 6364136223846793005L + 7)
      // Every endpoint engine commits once per tag, so versions 1-2 exist
      // everywhere (and exclude the NaN tag, local's 3rd commit).
      val k = 1 + rng.nextInt(2)
      val endpoints = 1 + rng.nextInt(2)
      val folders = Seq(ep1.root, ep2.root).take(endpoints)
      val grouped = rng.nextBoolean()
      val aggs = Seq(
        Seq("count(*) AS n", "sum(v) AS s", "max(v) - min(v) AS sp"),
        Seq("avg(v) AS a", "var_pop(v) AS vp"),
        Seq("percentile(v, 0.5) AS med", "count(v) AS n"))(rng.nextInt(3))
      val sel = (if (grouped) "SELECT tag, " else "SELECT ") +
        aggs.mkString(", ") + s" FROM mts VERSION AS OF $k" +
        (if (grouped) " GROUP BY tag" else "")
      val got = local.sql(
        s"INCLUDE MERGE ${folders.map(f => s"'$f'").mkString(", ")} $sel")
        .collect()
      val engines = local +: Seq(ep1, ep2).take(endpoints)
      engines.map(_.readTableVersion("mts", k)).reduce(_ unionByName _)
        .createOrReplaceTempView("__fm_travel")
      val want = spark.sql(
        sel.replace(s"FROM mts VERSION AS OF $k", "FROM __fm_travel"))
        .collect()
      val nKeys = if (grouped) 1 else 0
      def key(r: Row) =
        (0 until nKeys).map(i => String.valueOf(r.get(i))).mkString(" ")
      val (g, w) = (got.sortBy(key), want.sortBy(key))
      withClue(s"seed $seed [$sel]: ") {
        assert(g.length == w.length)
        g.zip(w).foreach { case (a, b) =>
          (0 until a.length).foreach { i =>
            (a.get(i), b.get(i)) match {
              case (x: java.lang.Double, y: java.lang.Double) =>
                assert(x.isNaN && y.isNaN || math.abs(x - y) <=
                  math.max(1e-12, 1e-9 * math.max(math.abs(x), math.abs(y))),
                  s"col $i: $x vs $y")
              case (x: java.lang.Float, y: java.lang.Float) =>
                assert(math.abs(x.toDouble - y.toDouble) <= 1e-6,
                  s"col $i: $x vs $y")
              case (x, y) => assert(x == y, s"col $i: $x vs $y")
            }
          }
        }
      }
    }
  }

  test("30 sketch-merge seeds: approx_count_distinct stays within 5x rsd " +
      "of the exact distinct count over the combined endpoints") {
    fixture
    (1 to 30).foreach { seed =>
      val rng = new scala.util.Random(seed * 2862933555777941757L + 11)
      val grouped = rng.nextBoolean()
      val rsd = Seq(0.02, 0.05)(rng.nextInt(2))
      val child = Seq("v", "tag", "ts")(rng.nextInt(3))
      val endpoints = 1 + rng.nextInt(2)
      val folders = Seq(ep1.root, ep2.root).take(endpoints)
      val combined = if (endpoints == 1) "__fm_c1" else "__fm_c2"
      val (sel, grp) =
        if (grouped) (s"SELECT tag, approx_count_distinct($child, $rsd) " +
          "AS ad FROM mts GROUP BY tag", 1)
        else (s"SELECT approx_count_distinct($child, $rsd) AS ad FROM mts", 0)
      val got = local.sql(
        s"INCLUDE MERGE ${folders.map(f => s"'$f'").mkString(", ")} $sel")
        .collect()
        .map(r => (if (grp == 1) r.getString(0) else "") -> r.getLong(grp))
        .toMap
      val exact = spark.sql(
        (if (grouped) s"SELECT tag, count(DISTINCT $child) AS e " +
          s"FROM $combined GROUP BY tag"
        else s"SELECT count(DISTINCT $child) AS e FROM $combined"))
        .collect()
        .map(r => (if (grp == 1) r.getString(0) else "") -> r.getLong(grp))
        .toMap
      withClue(s"seed $seed [$sel]: ") {
        assert(got.keySet == exact.keySet)
        exact.foreach { case (k, e) =>
          val rel = math.abs(got(k).toDouble / math.max(e, 1L) - 1.0)
          assert(rel <= 5 * rsd,
            s"group [$k]: estimate ${got(k)} vs exact $e (rel $rel)")
        }
      }
    }
  }

  test("rank-search statement chunking: a round spanning >8192 states " +
      "splits into several probe statements and stays exact") {
    // 4,100 groups × 2 ranks each = 8,200 states — one past the 8,192
    // per-statement cap, so every probe/fetch round runs as two chunked
    // statements whose merged counts must still resolve every group.
    def wide(seed: Int): Engine = {
      val e = new Engine(spark,
        Files.createTempDirectory("graft_fm_wide").toString)
      e.sql("CREATE TABLE wt(g INT, x DOUBLE)")
      import spark.implicits._
      val rng = new scala.util.Random(seed)
      e.write("wt", (0 until 4100).flatMap(g =>
        (0 until 15).map(_ => (g, rng.nextDouble() * 1000 - 500)))
        .toDF("g", "x"))
      e
    }
    val local = wide(1)
    val remote = wide(2)
    val got = local.sql(s"INCLUDE MERGE '${remote.root}' " +
      "SELECT g, percentile(x, 0.73) AS p FROM wt GROUP BY g")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    local.readTable("wt").unionByName(remote.readTable("wt"))
      .createOrReplaceTempView("__fm_wide")
    val want = spark.sql(
      "SELECT g, percentile(x, 0.73) AS p FROM __fm_wide GROUP BY g")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got.size == 4100 && got.keySet == want.keySet)
    want.foreach { case (g, w) =>
      assert(got(g) == w, s"group $g: ${got(g)} vs $w")
    }
  }

  test("forced fetch at the round cap is PAGINATED: per-statement fetch " +
      "rows stay bounded over a wide-gap interval, exactness unchanged") {
    // Cap pinned to 0 forces every state straight into the fetch with its
    // FULL (min, max] interval — 1,200 combined distinct values against a
    // fetch gap of 16 — the shape the old safety valve answered with one
    // unbounded result set. Now each fetch statement carries a per-state
    // row_number cap; the merge consumes the prefix proven complete
    // across endpoints and pages until the rank resolves. Asserted on
    // BOTH transports: generic SQL (normal table over TCP, statement text
    // carries the cap) and segment-native (TS table, frame carries
    // fetchLimit).
    val savedGap = FederatedAggregate.QuantileFetchGap
    val savedCap = FederatedAggregate.capRoundsOverrideForTests
    val savedGate = FederatedAggregate.NativeProbeMinPoints
    FederatedAggregate.QuantileFetchGap = 16L
    FederatedAggregate.capRoundsOverrideForTests = Some(0)
    FederatedAggregate.NativeProbeMinPoints = 0L
    try {
      // ---- Generic path: normal tables behind a live RemoteServer. ----
      def wide(offset: Double): Engine = {
        val e = new Engine(spark,
          Files.createTempDirectory("graft_fm_page").toString)
        e.sql("CREATE TABLE pg(x DOUBLE)")
        import spark.implicits._
        e.write("pg", (0 until 600).map(i => i * 1.0 + offset).toDF("x"))
        e
      }
      val local = wide(0.0)
      val remote = wide(0.5)
      val statements = scala.collection.mutable.ArrayBuffer.empty[String]
      val server = new RemoteServer(remote, onStatement = statements += _)
      try {
        val got = local.sql(s"INCLUDE MERGE '${server.address}' " +
          "SELECT percentile(x, 0.5) AS med, " +
          "percentile_disc(0.25) WITHIN GROUP (ORDER BY x) AS pd " +
          "FROM pg").collect().head
        local.readTable("pg").unionByName(remote.readTable("pg"))
          .createOrReplaceTempView("__fm_page")
        val want = spark.sql("SELECT percentile(x, 0.5) AS med, " +
          "percentile_disc(0.25) WITHIN GROUP (ORDER BY x) AS pd " +
          "FROM __fm_page").collect().head
        assert(got.getDouble(0) == want.getDouble(0), "median exact")
        assert(got.getDouble(1) == want.getDouble(1), "disc exact")
        val fetchStmts = statements.filter(_.contains("__rn <= 16"))
        assert(fetchStmts.size > 5,
          s"expected many bounded paginated fetch rounds, got " +
            s"${fetchStmts.size} of ${statements.size} statements")
        assert(!statements.exists(s => s.contains("__v") &&
          s.contains("GROUP BY __sid, __v") && !s.contains("__rn")),
          "every forced fetch statement must carry the per-state cap")
      } finally server.close()

      // ---- Native path: TS tables, frame-carried fetchLimit. ----
      def tsWide(tags: Seq[String], n: Int): Engine =
        makeEngine(tags, n, nanTag = scala.None)
      val tsLocal = tsWide(Seq("p", "q"), 400)
      val tsRemote = tsWide(Seq("q", "r"), 300)
      val stmts2 = scala.collection.mutable.ArrayBuffer.empty[String]
      val server2 = new RemoteServer(tsRemote, onStatement = stmts2 += _)
      try {
        val got = tsLocal.sql(s"INCLUDE MERGE '${server2.address}' " +
          "SELECT tag, percentile(v, 0.9) AS p90 FROM mts GROUP BY tag")
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        tsLocal.readTable("mts").unionByName(tsRemote.readTable("mts"))
          .createOrReplaceTempView("__fm_page_ts")
        val want = spark.sql("SELECT tag, percentile(v, 0.9) AS p90 " +
          "FROM __fm_page_ts GROUP BY tag")
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(got.keySet == want.keySet)
        want.foreach { case (t, w) => assert(got(t) == w, s"p90($t)") }
        val native = stmts2.filter(graft.tsdb.RankProbe.matches)
          .map(graft.tsdb.RankProbe.decode)
        assert(native.nonEmpty && native.forall(_.fetch),
          "cap=0 must force fetch-only native rounds")
        assert(native.forall(_.fetchLimit == 16L),
          s"native forced fetches must carry the cap: " +
            s"${native.map(_.fetchLimit)}")
        assert(native.size > 2,
          s"expected paginated native rounds, got ${native.size}")
      } finally server2.close()
    } finally {
      FederatedAggregate.QuantileFetchGap = savedGap
      FederatedAggregate.capRoundsOverrideForTests = savedCap
      FederatedAggregate.NativeProbeMinPoints = savedGate
    }
  }

  // Two normal-table endpoints with INT/BIGINT/DECIMAL/FLOAT/DOUBLE
  // columns: the typed seeds assert the merged SCHEMA equals the local
  // plan's (sum/avg over decimal must not widen) and values match
  // exactly — decimal merges run in decimal arithmetic end to end.
  private def typedEngine(seed: Int): Engine = {
    val e = new Engine(spark,
      Files.createTempDirectory("graft_fm_typed").toString)
    e.sql("CREATE TABLE nt(g INT, i INT, l BIGINT, d1 DECIMAL(10,2), " +
      "d2 DECIMAL(38,6), d3 DECIMAL(12,2), f FLOAT, x DOUBLE)")
    val rng = new scala.util.Random(seed * 40503L + 5)
    val rows = (0 until 400).map { _ =>
      Row(
        rng.nextInt(6),
        rng.nextInt(100000) - 50000,
        (rng.nextLong() % 1000000000000L),
        new java.math.BigDecimal(java.math.BigInteger.valueOf(
          (rng.nextInt(2000000) - 1000000).toLong), 2),
        new java.math.BigDecimal(java.math.BigInteger.valueOf(
          rng.nextLong() % 1000000000000L), 6),
        // ~1e9-magnitude values: the combined SUM (~1.6e12) overflows
        // avg(d3)'s DECIMAL(16,6) result range while the AVERAGE fits —
        // the shape whose merge must divide like Spark's
        // DecimalDivideWithOverflowCheck, not pre-cast the sum (the
        // sf0.1 bench caught exactly this on ts_include_decimal_merge).
        new java.math.BigDecimal(java.math.BigInteger.valueOf(
          100000000000L + (rng.nextLong() % 100000000000L).abs), 2),
        rng.nextFloat() * 200f - 100f,
        rng.nextDouble() * 2000 - 1000)
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "g INT, i INT, l BIGINT, d1 DECIMAL(10,2), d2 DECIMAL(38,6), " +
        "d3 DECIMAL(12,2), f FLOAT, x DOUBLE")
    e.write("nt", spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema))
    e
  }
  private lazy val typedLocal = typedEngine(1)
  private lazy val typedEp = typedEngine(2)

  test("60 typed seeds over INT/BIGINT/DECIMAL normal tables: merged " +
      "schema == local schema and values match exactly") {
    typedLocal.readTable("nt").unionByName(typedEp.readTable("nt"))
      .createOrReplaceTempView("__fm_typed")
    (1 to 60).foreach { seed =>
      val rng = new scala.util.Random(seed * 982451653L + 17)
      def pick[T](xs: Seq[T]): T = xs(rng.nextInt(xs.length))
      val pool = Seq(
        "count(*)", "count(d1)", "sum(i)", "sum(l)", "sum(d1)", "sum(d2)",
        "sum(f)", "sum(x)", "avg(i)", "avg(l)", "avg(d1)", "avg(d2)",
        "avg(d3)", "sum(d3)",
        "avg(x)", "min(d1)", "max(d2)", "min(l)", "max(i)",
        "var_samp(x)", "stddev_pop(i)",
        "percentile(d1, 0.5)", "percentile(l, 0.25)", "median(x)",
        "percentile_disc(0.9) WITHIN GROUP (ORDER BY d2)",
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY i)")
      val aggs = Seq.fill(1 + rng.nextInt(3))(pick(pool)).distinct
        .zipWithIndex.map { case (a, i) => s"$a AS t$i" }
      val grouped = rng.nextBoolean()
      val sel = (if (grouped) "SELECT g, " else "SELECT ") +
        aggs.mkString(", ") + " FROM nt" + (if (grouped) " GROUP BY g" else "")
      val gotDf = typedLocal.sql(s"INCLUDE MERGE '${typedEp.root}' $sel")
      val wantDf = spark.sql(sel.replace("FROM nt", "FROM __fm_typed"))
      withClue(s"seed $seed [$sel]: ") {
        assert(gotDf.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
          wantDf.schema.fields.map(f => (f.name, f.dataType)).toSeq,
          s"schema drift: ${gotDf.schema.sql} vs ${wantDf.schema.sql}")
        val nKeys = if (grouped) 1 else 0
        def key(r: Row) =
          (0 until nKeys).map(i => String.valueOf(r.get(i))).mkString(" ")
        val (g, w) = (gotDf.collect().sortBy(key), wantDf.collect().sortBy(key))
        assert(g.length == w.length)
        g.zip(w).foreach { case (a, b) =>
          (0 until a.length).foreach { i =>
            (a.get(i), b.get(i)) match {
              case (null, null) =>
              case (p: java.math.BigDecimal, q: java.math.BigDecimal) =>
                assert(p.compareTo(q) == 0, s"col $i: $p vs $q")
              case (p: java.lang.Double, q: java.lang.Double) =>
                assert(p.isNaN && q.isNaN || math.abs(p - q) <=
                  math.max(1e-12, 1e-9 * math.max(math.abs(p), math.abs(q))),
                  s"col $i: $p vs $q")
              case (p, q) => assert(p == q, s"col $i: $p vs $q")
            }
          }
        }
      }
    }
  }

  test("decimal avg whose TOTAL unscaled sum exceeds 2^63 merges without " +
      "overflow under BOTH ANSI settings") {
    // 2 × 47M rows of the max-magnitude DECIMAL(11,0): each endpoint's
    // unscaled sum (≈4.7e18) is BIGINT-safe but the merged total
    // (≈9.4e18) is past Long.MaxValue — the shape where a BIGINT partial
    // re-sum wraps silently (non-ANSI) or throws (ANSI). The
    // DECIMAL(38,0) partial is exact at any row count; divergence from
    // the local double-accumulating plan past 2^53 total unscaled is
    // bounded imprecision, never overflow — so the merged average of a
    // CONSTANT column must come back as exactly that constant (the one
    // double rounding of the exact sum divides back out to < half a
    // result-scale ulp) under ansi=true AND ansi=false, with the local
    // plan's schema.
    val n = 47000000L
    val c = 99999999999L // max |unscaled| at DECIMAL(11,0)
    def bigEngine(): Engine = {
      val e = new Engine(spark,
        Files.createTempDirectory("graft_fm_ovf").toString)
      e.sql("CREATE TABLE ovf(d DECIMAL(11,0))")
      e.write("ovf", spark.range(n).select(
        lit(new java.math.BigDecimal(c)).cast("decimal(11,0)").as("d")))
      e
    }
    val big1 = bigEngine()
    val big2 = bigEngine()
    val sel = "SELECT avg(d) AS a, count(d) AS nd FROM ovf"
    // Local-plan schema via analysis only (no 94M-row local job).
    big1.readTable("ovf").createOrReplaceTempView("__fm_ovf")
    val wantSchema = spark.sql(sel.replace("FROM ovf", "FROM __fm_ovf"))
      .schema.fields.map(f => (f.name, f.dataType)).toSeq
    val expected = new java.math.BigDecimal(c).setScale(4)
    val savedAnsi = spark.conf.get("spark.sql.ansi.enabled")
    try {
      Seq("true", "false").foreach { ansi =>
        spark.conf.set("spark.sql.ansi.enabled", ansi)
        val df = big1.sql(s"INCLUDE MERGE '${big2.root}' $sel")
        withClue(s"ansi=$ansi: ") {
          assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
            wantSchema, s"schema drift: ${df.schema.sql}")
          val rows = df.collect()
          assert(rows.length == 1)
          assert(rows.head.getDecimal(0).compareTo(expected) == 0,
            s"avg ${rows.head.getDecimal(0)} != $expected")
          assert(rows.head.getLong(1) == 2 * n, s"count ${rows.head.getLong(1)}")
        }
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", savedAnsi)
  }

  test("integral/decimal percentile children beyond the double-exact " +
      "range are rejected, not silently collapsed") {
    typedLocal // force fixture
    val e1 = intercept[IllegalArgumentException] {
      typedLocal.sql(s"INCLUDE MERGE '${typedEp.root}' " +
        "SELECT percentile(l * 100000, 0.5) AS p FROM nt")
    }
    assert(e1.getMessage.contains("double-representable"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      typedLocal.sql(s"INCLUDE MERGE '${typedEp.root}' " +
        "SELECT median(CAST(d2 * 10000000 AS DECIMAL(38,6))) AS p FROM nt")
    }
    assert(e2.getMessage.contains("double-representable"), e2.getMessage)
  }

  test("every rejection branch fires with its clear error") {
    fixture
    def rejects(select: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        local.sql(s"INCLUDE MERGE '${ep1.root}' $select")
      }
      assert(e.getMessage.contains(fragment),
        s"for [$select] got: ${e.getMessage}")
    }
    rejects("SELECT count(DISTINCT tag) AS n FROM mts", "approx_count_distinct")
    rejects("SELECT sum(v) FILTER (WHERE v > 0) AS s FROM mts", "FILTER")
    rejects("SELECT tag, rank() OVER (ORDER BY count(*)) AS r FROM mts " +
      "GROUP BY tag", "window")
    rejects("SELECT count(*) AS n FROM mts UNION ALL " +
      "SELECT count(*) AS n FROM mts", "set operations")
    rejects("SELECT tag, count(*) AS n FROM mts GROUP BY ROLLUP(tag)",
      "GROUPING SETS")
    rejects("SELECT tag, count(*) AS n FROM mts GROUP BY CUBE(tag)",
      "GROUPING SETS")
    rejects("SELECT tag, count(*) AS n FROM mts GROUP BY 1", "ordinal")
    rejects("SELECT collect_list(v) AS l FROM mts",
      "not algebraically mergeable")
    rejects("SELECT percentile(v, array()) AS p FROM mts", "non-empty")
    rejects("SELECT percentile(v, 0.5, 2) AS p FROM mts", "frequency")
    rejects("SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY v DESC) " +
      "AS p FROM mts", "not supported")
    // A string child is implicitly cast to double at analysis (failing in
    // the ANSI cast at runtime, exactly like a local percentile(tag)); an
    // interval child survives analysis un-cast and hits the guard.
    rejects("SELECT median(ts - TIMESTAMP '2024-01-01') AS p FROM mts",
      "numeric")
    rejects("SELECT approx_count_distinct(array(v)) AS n FROM mts",
      "sketch-mergeable")
    rejects("SELECT tag FROM mts", "aggregate SELECT")
    // NaN guard: tag "c" has NaN runs and the seed forgot the filter.
    val e = intercept[IllegalArgumentException] {
      local.sql(s"INCLUDE MERGE '${ep1.root}' " +
        "SELECT tag, median(v) AS m FROM mts GROUP BY tag")
    }
    assert(e.getMessage.contains("NaN"), e.getMessage)
    // Infinity guard: ±Inf would poison the probe thresholds (lo+(hi-lo)·m
    // = NaN); the child expression manufactures one deterministically.
    val e2 = intercept[IllegalArgumentException] {
      local.sql(s"INCLUDE MERGE '${ep1.root}' " +
        "SELECT median(CASE WHEN tag = 'a' THEN float('Infinity') " +
        "ELSE v END) AS m FROM mts WHERE NOT isnan(v)")
    }
    assert(e2.getMessage.contains("infinite"), e2.getMessage)
  }
}
