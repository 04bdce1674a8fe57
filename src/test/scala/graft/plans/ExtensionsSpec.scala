package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.tsdb.Engine

/** The SparkSessionExtensions path: plain `spark.sql` (NOT Engine.sql) over
  * a registered time series view gets segment-native simple aggregates,
  * with the sameResult spoof-guard intact.
  */
class ExtensionsSpec extends AnyFunSuite {

  // A dedicated session: extensions must be installed at build time, and
  // getOrCreate returns any existing default session unchanged — so the
  // shared test session is parked while this one is built, then restored
  // as the default for the other suites.
  private lazy val spark: SparkSession = graft.tsdb.SparkTestSession.synchronized {
    val shared = graft.tsdb.SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-extensions-tests")
      // (not the spark.sql.extensions conf: with a pre-existing
      // SparkContext that static conf is read from the context's conf and
      // would be silently ignored here)
      .withExtensions(new GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(shared)
    assert(s ne shared, "extensions session must be distinct")
    s
  }

  private def freshEngine(): Engine = {
    val engine = new Engine(spark, Files.createTempDirectory("graft_ext").toString)
    engine.sql("CREATE TIME SERIES TABLE ext(ts TIMESTAMP, v FIELD, tag TAG)")
    val rng = new scala.util.Random(7)
    import spark.implicits._
    val df = (0 until 3000).map(i =>
      (1700000000000000L + i * 1000000L, rng.nextFloat() * 100, s"t${i % 3}"))
      .toDF("ts", "v", "tag")
    engine.write("ext", df)
    engine.sql("SELECT 1") // registers the views (and the engine) lazily
    engine
  }

  test("plain spark.sql aggregates are answered from segment metadata") {
    freshEngine()
    val df = spark.sql(
      "SELECT COUNT(v) AS n, MIN(v) AS mn, MAX(v) AS mx, SUM(v) AS s, AVG(v) AS a FROM ext")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"extension rewrite must skip reconstruction, got plan:\n$plan")

    // Values must match the gridded path exactly / within the reference's
    // SUM-AVG tolerance (integration_test.rs:1129-1243). A field predicate
    // (always true) forces the control through reconstruction — timestamp
    // ranges no longer do, since they rewrite to the hybrid plan.
    val expected = spark.sql(
      "SELECT COUNT(v), MIN(v), MAX(v), SUM(v), AVG(v) FROM ext " +
        "WHERE v <= CAST('Infinity' AS FLOAT)")
    assert(expected.queryExecution.executedPlan.toString.contains("Generate"),
      "the filtered control query must grid")
    val g = expected.collect().head
    val r = df.collect().head
    assert(r.getLong(0) == g.getLong(0))
    assert(r.getFloat(1) == g.getFloat(1))
    assert(r.getFloat(2) == g.getFloat(2))
    assert(math.abs(r.getDouble(3) - g.getDouble(3)) <=
      math.abs(g.getDouble(3)) * 1e-5)
    assert(math.abs(r.getDouble(4) - g.getDouble(4)) <=
      math.abs(g.getDouble(4)) * 1e-5)
  }

  test("variance and first/last rewrite through the extensions splice") {
    freshEngine()
    val df = spark.sql(
      "SELECT var_samp(v) AS vs, stddev_pop(v) AS sp, " +
        "min_by(v, ts) AS fv, max_by(v, ts) AS lv FROM ext")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"variance/first/last must stay segment-native via spark.sql:\n$plan")
    val control = spark.sql(
      "SELECT var_samp(v), stddev_pop(v), min_by(v, ts), max_by(v, ts) " +
        "FROM ext WHERE v <= CAST('Infinity' AS FLOAT)")
    assert(control.queryExecution.executedPlan.toString.contains("Generate"))
    val g = control.collect().head
    val r = df.collect().head
    assert(math.abs(r.getDouble(0) - g.getDouble(0)) <=
      math.abs(g.getDouble(0)) * 1e-9)
    assert(math.abs(r.getDouble(1) - g.getDouble(1)) <=
      math.abs(g.getDouble(1)) * 1e-9)
    assert(r.getFloat(2) == g.getFloat(2) && r.getFloat(3) == g.getFloat(3))
  }

  test("tag-grouped aggregates rewrite and match the gridded group-by") {
    freshEngine()
    val df = spark.sql(
      "SELECT tag, COUNT(v) AS n FROM ext GROUP BY tag ORDER BY tag")
    assert(!df.queryExecution.executedPlan.toString.contains("Generate"))
    val gridded = spark.sql(
      "SELECT tag, COUNT(v) AS n FROM ext WHERE v <= CAST('Infinity' AS FLOAT) " +
        "GROUP BY tag ORDER BY tag")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      gridded.collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("date_trunc groupings rewrite through the extensions splice") {
    freshEngine()
    // ORDER BY sits above the Aggregate: the rule must rewrite it in
    // place and the spliced Project must preserve the Sort's exprIds —
    // including the BucketRef output (TimestampType passthrough).
    val df = spark.sql(
      "SELECT tag, date_trunc('HOUR', ts) AS h, COUNT(v) AS n, AVG(v) AS a " +
        "FROM ext GROUP BY tag, date_trunc('HOUR', ts) ORDER BY tag, h")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("segmentlen"),
      s"bucketed rewrite must use closed forms for contained segments:\n$plan")

    val gridded = spark.sql(
      "SELECT tag, date_trunc('HOUR', ts) AS h, COUNT(v) AS n, AVG(v) AS a " +
        "FROM ext WHERE v <= CAST('Infinity' AS FLOAT) " +
        "GROUP BY tag, date_trunc('HOUR', ts) ORDER BY tag, h")
    assert(gridded.queryExecution.executedPlan.toString.contains("Generate"))
    val got = df.collect()
    val want = gridded.collect()
    assert(got.nonEmpty && got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      assert(g.getTimestamp(1) == w.getTimestamp(1))
      assert(g.getLong(2) == w.getLong(2))
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) <=
        math.abs(w.getDouble(3)) * 1e-5)
    }
  }

  test("the value-filtered family splices through plain spark.sql") {
    freshEngine()
    // Each control injects a non-bare-field conjunct (or wraps the
    // aggregated column in v*1) — vacuous on this finite fixture but
    // unrecognizable to the rewrite — forcing the gridded plan of the
    // same semantics.
    val inf = "CAST('Infinity' AS FLOAT)"
    val cases = Seq(
      ("SELECT tag, COUNT(*) AS n, SUM(v) AS s, MAX(v) AS mx FROM ext " +
         "WHERE v > 50 GROUP BY tag ORDER BY tag",
       "SELECT tag, COUNT(*) AS n, SUM(v) AS s, MAX(v) AS mx FROM ext " +
         s"WHERE v > 50 AND v * 1 <= $inf GROUP BY tag ORDER BY tag"),
      ("SELECT tag, COUNT(*) FILTER (WHERE v > 50) AS n_hi, COUNT(*) AS n " +
         "FROM ext GROUP BY tag ORDER BY tag",
       "SELECT tag, COUNT(*) FILTER (WHERE v > 50 AND v * 1 <= " +
         s"$inf) AS n_hi, COUNT(*) AS n FROM ext GROUP BY tag ORDER BY tag"),
      ("SELECT tag, MEDIAN(v) AS med FROM ext GROUP BY tag ORDER BY tag",
       "SELECT tag, MEDIAN(v * 1) AS med FROM ext GROUP BY tag ORDER BY tag"),
      ("SELECT COUNT(*) AS n FROM ext WHERE v < 10 OR v > 90",
       "SELECT COUNT(*) AS n FROM ext " +
         s"WHERE (v < 10 OR v > 90) AND v * 1 <= $inf"))
    for ((q, cq) <- cases) {
      val df = spark.sql(q)
      assert(!df.queryExecution.executedPlan.toString.contains("Generate"),
        s"must splice via the extensions rule: $q")
      val ctrl = spark.sql(cq)
      assert(ctrl.queryExecution.executedPlan.toString.contains("Generate"),
        s"control must grid: $cq")
      val got = df.collect()
      val want = ctrl.collect()
      assert(got.length == want.length, q)
      got.zip(want).foreach { case (a, b) =>
        a.toSeq.zip(b.toSeq).foreach {
          case (x: java.lang.Double, y: java.lang.Double) =>
            assert(math.abs(x - y) <= 1e-6 * math.max(1.0, math.abs(y)),
              s"$q: $a vs $b")
          case (x: java.lang.Float, y: java.lang.Float) =>
            assert(java.lang.Float.compare(x, y) == 0, s"$q: $a vs $b")
          case (x, y) => assert(x == y, s"$q: $a vs $b")
        }
      }
    }
  }

  test("filters, expressions, and spoofed aliases behave per contract") {
    freshEngine()
    // A tag equality no longer blocks the rewrite: tags are denormalized
    // into every segment row, so the filter prunes the segment relation.
    val filtered = spark.sql("SELECT COUNT(v) AS n FROM ext WHERE tag = 't0'")
    assert(!filtered.queryExecution.executedPlan.toString.contains("Generate"),
      "tag-equality aggregate must stay segment-native")
    val filteredControl = spark.sql("SELECT COUNT(v) AS n FROM ext " +
      "WHERE v <= CAST('Infinity' AS FLOAT) AND tag = 't0'")
    assert(filteredControl.queryExecution.executedPlan.toString.contains("Generate"))
    assert(filtered.collect().head.getLong(0) ==
      filteredControl.collect().head.getLong(0))

    // A subquery aliased with the table's name must not be mistaken for the
    // registered view.
    val spoofed = spark.sql(
      "SELECT COUNT(v) AS n FROM (SELECT * FROM ext WHERE tag = 't0') AS ext")
    assert(spoofed.queryExecution.executedPlan.toString.contains("Generate"))
    assert(spoofed.collect().head.getLong(0) ==
      filteredControl.collect().head.getLong(0))

    // LINEAR expressions of a field now fold onto the base closed forms
    // (sum(a*f) = a*sum(f)) — still no reconstruction, same answer as the
    // gridded control; non-linear expressions and filters on field values
    // still grid.
    val exprAgg = spark.sql("SELECT SUM(v * 2) AS s FROM ext")
    assert(!exprAgg.queryExecution.executedPlan.toString.contains("Generate"),
      "linear-expression aggregate must stay segment-native")
    val exprControl = spark.sql("SELECT SUM(v * 2) AS s FROM ext " +
      "WHERE v <= CAST('Infinity' AS FLOAT)")
    assert(exprControl.queryExecution.executedPlan.toString.contains("Generate"))
    assert(math.abs(exprAgg.collect().head.getDouble(0) -
      exprControl.collect().head.getDouble(0)) <=
      math.abs(exprControl.collect().head.getDouble(0)) * 1e-6 + 1e-9)
    val nonLinear = spark.sql("SELECT SUM(v * v) AS s FROM ext")
    assert(nonLinear.queryExecution.executedPlan.toString.contains("Generate"))
    // COUNT under a value predicate is segment-native (thresholdCount)
    // through the extensions splice too; the v*1 formulation is not a
    // recognizable bare-field comparison, so it grids — same answer.
    val fieldFiltered = spark.sql("SELECT COUNT(v) AS n FROM ext WHERE v > 50")
    assert(!fieldFiltered.queryExecution.executedPlan.toString.contains("Generate"))
    val fieldControl = spark.sql("SELECT COUNT(v) AS n FROM ext WHERE v * 1 > 50")
    assert(fieldControl.queryExecution.executedPlan.toString.contains("Generate"))
    assert(fieldFiltered.collect().head.getLong(0) ==
      fieldControl.collect().head.getLong(0))

    // tag IN (...) prunes the segment relation too.
    val inFiltered = spark.sql(
      "SELECT COUNT(v) AS n FROM ext WHERE tag IN ('t0', 't2')")
    assert(!inFiltered.queryExecution.executedPlan.toString.contains("Generate"),
      "tag IN-list aggregate must stay segment-native")
    val inControl = spark.sql("SELECT COUNT(v) AS n FROM ext " +
      "WHERE v <= CAST('Infinity' AS FLOAT) AND tag IN ('t0', 't2')")
    assert(inFiltered.collect().head.getLong(0) ==
      inControl.collect().head.getLong(0))

    // An IN-list combined with a time range rides the hybrid plan (interior
    // metadata partials UNION gridded boundary partials), like a tag
    // equality would.
    val inRanged = spark.sql(
      "SELECT COUNT(v) AS n, SUM(v) AS s FROM ext WHERE tag IN ('t0', 't2') " +
        "AND ts >= TIMESTAMP '2023-11-14 22:30:00'")
    val inRangedPlan = inRanged.queryExecution.executedPlan.toString
    assert(inRangedPlan.contains("Union"),
      s"IN + range must take the hybrid union plan:\n$inRangedPlan")
    val inRangedControl = spark.sql(
      "SELECT COUNT(v) AS n, SUM(v) AS s FROM ext " +
        "WHERE v <= CAST('Infinity' AS FLOAT) AND tag IN ('t0', 't2') " +
        "AND ts >= TIMESTAMP '2023-11-14 22:30:00'")
    assert(inRangedControl.queryExecution.executedPlan.toString.contains("Generate"))
    val ir = inRanged.collect().head
    val ic = inRangedControl.collect().head
    assert(ir.getLong(0) == ic.getLong(0) && ir.getLong(0) > 0)
    assert(math.abs(ir.getDouble(1) - ic.getDouble(1)) <=
      math.abs(ic.getDouble(1)) * 1e-9)
  }

  test("timestamp-ranged aggregates rewrite to the hybrid plan") {
    freshEngine()
    // ts base 1700000000000000 us = 2023-11-14 22:13:20 UTC, 1s spacing.
    val ranged = spark.sql(
      "SELECT COUNT(v) AS n, MIN(v) AS mn, MAX(v) AS mx, SUM(v) AS s " +
        "FROM ext WHERE ts >= TIMESTAMP '2023-11-14 22:30:00' " +
        "AND ts <= TIMESTAMP '2023-11-14 22:40:00'")
    val plan = ranged.queryExecution.executedPlan.toString
    // Hybrid = interior metadata partials UNIONed with gridded boundary
    // partials; a fully gridded aggregate has no Union.
    assert(plan.contains("Union"), s"expected the hybrid union plan:\n$plan")
    val control = spark.sql(
      "SELECT COUNT(v) AS n, MIN(v) AS mn, MAX(v) AS mx, SUM(v) AS s " +
        "FROM ext WHERE v <= CAST('Infinity' AS FLOAT) " +
        "AND ts >= TIMESTAMP '2023-11-14 22:30:00' " +
        "AND ts <= TIMESTAMP '2023-11-14 22:40:00'")
    assert(control.queryExecution.executedPlan.toString.contains("Generate"))
    val r = ranged.collect().head
    val c = control.collect().head
    assert(r.getLong(0) == c.getLong(0) && r.getLong(0) > 0)
    assert(r.getFloat(1) == c.getFloat(1) && r.getFloat(2) == c.getFloat(2))
    assert(math.abs(r.getDouble(3) - c.getDouble(3)) <=
      math.abs(c.getDouble(3)) * 1e-9)

    // Strict bounds and reversed operand order tighten correctly.
    val strict = spark.sql(
      "SELECT COUNT(v) AS n FROM ext WHERE ts > TIMESTAMP '2023-11-14 22:30:00' " +
        "AND TIMESTAMP '2023-11-14 22:40:00' > ts")
    val strictControl = spark.sql(
      "SELECT COUNT(v) AS n FROM ext WHERE v <= CAST('Infinity' AS FLOAT) " +
        "AND ts > TIMESTAMP '2023-11-14 22:30:00' " +
        "AND ts < TIMESTAMP '2023-11-14 22:40:00'")
    assert(strict.collect().head.getLong(0) ==
      strictControl.collect().head.getLong(0))

    // Mixed range + tag equality + grouping rewrites too.
    val mixed = spark.sql(
      "SELECT tag, COUNT(v) AS n FROM ext " +
        "WHERE ts >= TIMESTAMP '2023-11-14 22:30:00' AND tag = 't1' " +
        "GROUP BY tag")
    val mixedControl = spark.sql(
      "SELECT tag, COUNT(v) AS n FROM ext " +
        "WHERE v <= CAST('Infinity' AS FLOAT) " +
        "AND ts >= TIMESTAMP '2023-11-14 22:30:00' AND tag = 't1' " +
        "GROUP BY tag")
    assert(mixed.collect().map(x => (x.getString(0), x.getLong(1))).toSeq ==
      mixedControl.collect().map(x => (x.getString(0), x.getLong(1))).toSeq)
  }

  test("count(*) rewrites segment-natively on a multi-field table") {
    val engine = new Engine(spark, Files.createTempDirectory("graft_ext").toString)
    engine.sql("CREATE TIME SERIES TABLE extmf(ts TIMESTAMP, v FIELD, " +
      "w FIELD, tag TAG)")
    val rng = new scala.util.Random(11)
    import spark.implicits._
    val df = (0 until 2000).map(i =>
      (1700000000000000L + i * 1000000L, rng.nextFloat() * 100,
        rng.nextFloat() * 10, s"t${i % 3}"))
      .toDF("ts", "v", "w", "tag")
    engine.write("extmf", df)
    engine.sql("SELECT 1")

    // All ingest paths write every field of a row together (NULLs are
    // rejected), so count(*) equals any field's segment-len sum.
    val starCount = spark.sql("SELECT COUNT(*) AS n FROM extmf")
    assert(!starCount.queryExecution.executedPlan.toString.contains("Generate"),
      "multi-field count(*) must be answered from segment metadata")
    assert(starCount.collect().head.getLong(0) == 2000L)

    val grouped = spark.sql(
      "SELECT tag, COUNT(*) AS n FROM extmf GROUP BY tag ORDER BY tag")
    assert(!grouped.queryExecution.executedPlan.toString.contains("Generate"))
    val control = spark.sql(
      "SELECT tag, COUNT(*) AS n FROM extmf WHERE v <= CAST('Infinity' AS FLOAT) " +
        "GROUP BY tag ORDER BY tag")
    assert(control.queryExecution.executedPlan.toString.contains("Generate"))
    assert(grouped.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      control.collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("aggregate inside a larger query is rewritten in place") {
    freshEngine()
    val df = spark.sql(
      "SELECT n * 2 AS n2 FROM (SELECT COUNT(v) AS n FROM ext)")
    assert(!df.queryExecution.executedPlan.toString.contains("Generate"))
    assert(df.collect().head.getLong(0) == 6000L)
  }
}
