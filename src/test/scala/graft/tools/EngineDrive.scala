package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tsdb.Engine

/** Manual end-to-end drive of the tsdb engine on real testdata: DDL via the
  * extended SQL surface, ingest of events.parquet, SQL + structured reads,
  * segment-native vs gridded aggregates, time-range pruning, copy/truncate.
  *
  * Run with: sbt "Test/runMain graft.tools.EngineDrive [sfDir]"
  */
object EngineDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft_drive").toString
    val engine = new Engine(spark, root)
    println(s"data folder: $root")

    // DDL through the extended SQL surface.
    engine.sql("CREATE TIME SERIES TABLE events_ts(" +
      "ts TIMESTAMP, value FIELD, value_x2 FIELD AS (value * 2.0), user TAG)")
    println(s"tables: ${engine.tables()}")
    println(s"schema: ${engine.schema("events_ts").simpleString}")

    // Ingest real events (ts -> us long, value -> float, user_id -> tag).
    val events = graft.queries.QueryUtil.table(spark, sfDir, "events")
      .selectExpr("unix_micros(ts) AS ts",
        "CAST(value AS FLOAT) AS value", "CAST(user_id AS STRING) AS user")
    engine.write("events_ts", events)
    val rawCount = events.count()

    // SQL over the registered logical view.
    val viaSql = engine.sql(
      "SELECT COUNT(*) AS n, MIN(value) AS mn, MAX(value) AS mx FROM events_ts")
      .collect().head
    println(s"sql: n=${viaSql.getLong(0)} min=${viaSql.getFloat(1)} max=${viaSql.getFloat(2)}")
    println(s"raw: n=$rawCount (match=${viaSql.getLong(0) == rawCount})")

    // Segment-native vs gridded aggregates.
    val nativeAvg = engine.readTimeSeriesTable("events_ts", Seq("value"),
      engine.Aggregate.Avg).collect().head.getDouble(0)
    val griddedAvg = engine.readTable("events_ts")
      .agg(avg("value")).collect().head.getDouble(0)
    println(f"avg: native=$nativeAvg%.6f gridded=$griddedAvg%.6f " +
      f"relerr=${math.abs((nativeAvg - griddedAvg) / griddedAvg)}%.2e")

    // Generated column check through plain SQL.
    val genBad = engine.sql(
      "SELECT COUNT(*) AS bad FROM events_ts WHERE ABS(value_x2 - 2*value) > 1e-3")
      .collect().head.getLong(0)
    println(s"generated column mismatches: $genBad")

    // Time-range query with segment pruning vs raw filter.
    val mid = engine.sql("SELECT CAST(AVG(unix_micros(ts)) AS LONG) FROM events_ts")
      .collect().head.getLong(0)
    val inst = java.time.Instant.ofEpochSecond(mid / 1000000L, mid % 1000000L * 1000L)
    val ranged = engine.readTimeSeriesTable("events_ts",
      startTime = Some(inst)).count()
    val rawRanged = events.where(col("ts") >= mid).count()
    println(s"range: engine=$ranged raw=$rawRanged (match=${ranged == rawRanged})")

    // Per-tag group-by from segments only.
    val byUser = engine.readTimeSeriesTable("events_ts", Seq("value"),
      engine.Aggregate.Count, groupByTags = Seq("user"))
    println(s"per-user groups: ${byUser.count()} (expected 150)")

    // Storage footprint.
    val segCount = engine.dataFolder.segments("events_ts").count()
    println(s"segments: $segCount for $rawCount points")

    // Probe: malformed DDL must fail cleanly.
    try {
      engine.sql("CREATE TIME SERIES TABLE broken(ts TIMESTAMP, v FIELD(nope))")
      println("probe ddl: NO ERROR (unexpected)")
    } catch {
      case e: Exception => println(s"probe ddl: rejected (${e.getMessage.take(80)})")
    }

    // SQL INSERT INTO routes through the compression path.
    engine.sql("INSERT INTO events_ts VALUES " +
      "(TIMESTAMP '2030-01-01 00:00:00', CAST(1.0 AS FLOAT), 'probe')," +
      "(TIMESTAMP '2030-01-01 00:00:01', CAST(2.0 AS FLOAT), 'probe')")
    val probeRows = engine.sql(
      "SELECT COUNT(*) AS n FROM events_ts WHERE user = 'probe'")
      .collect().head.getLong(0)
    println(s"insert into: probe rows=$probeRows (expected 2)")

    // Catalyst segment-aggregate rewrite: whole-table SQL aggregate plan
    // must not contain a reconstruction (Generate) step.
    val aggDf = engine.sql("SELECT COUNT(value) AS n, AVG(value) AS a FROM events_ts")
    val aggPlan = aggDf.queryExecution.executedPlan.toString
    val aggRow = aggDf.collect().head
    println(s"sql-agg rewrite: n=${aggRow.getLong(0)} avg=${aggRow.getDouble(1)} " +
      s"segment_native=${!aggPlan.contains("Generate")}")

    // INCLUDE federation across a second data folder.
    val rootB = Files.createTempDirectory("graft_drive_b").toString
    val engineB = new Engine(spark, rootB)
    engineB.sql("CREATE TIME SERIES TABLE events_ts(" +
      "ts TIMESTAMP, value FIELD, value_x2 FIELD AS (value * 2.0), user TAG)")
    engineB.sql("INSERT INTO events_ts VALUES " +
      "(TIMESTAMP '2031-01-01 00:00:00', CAST(9.0 AS FLOAT), 'remote')")
    val federated = engine.sql(
      s"INCLUDE '$rootB' SELECT COUNT(*) AS n FROM events_ts").collect()
    println(s"include: partial counts=${federated.map(_.getLong(0)).mkString("+")}")

    // Probe: INSERT with wrong arity must fail cleanly.
    try {
      engine.sql("INSERT INTO events_ts VALUES (TIMESTAMP '2030-01-01', 1.0)")
      println("probe insert arity: NO ERROR (unexpected)")
    } catch {
      case e: Exception =>
        println(s"probe insert arity: rejected (${e.getMessage.take(70)})")
    }

    // Probe: a filtered subquery aliased with the table's name must NOT be
    // answered whole-table by the segment-aggregate rewrite.
    val spoof = engine.sql("SELECT COUNT(value) AS n FROM " +
      "(SELECT value FROM events_ts WHERE user = '1') events_ts")
    val spoofPlan = spoof.queryExecution.executedPlan.toString
    val spoofN = spoof.collect().head.getLong(0)
    val trueN = engine.readTable("events_ts")
      .where(org.apache.spark.sql.functions.col("user") === "1").count()
    println(s"spoof probe: n=$spoofN expected=$trueN " +
      s"rewritten=${!spoofPlan.contains("Generate")}")

    // Probe: duplicate timestamps within a series must round-trip, not hang.
    engine.sql("CREATE TIME SERIES TABLE dup(ts TIMESTAMP, v FIELD, tag TAG)")
    import spark.implicits._
    val dupDf = Seq.fill(10)((1700000000000000L, 5.0f, "d"))
      .toDF("ts", "v", "tag")
    engine.write("dup", dupDf)
    println(s"dup-ts probe: rows=${engine.readTable("dup").count()} (expected 10)")

    // Normal table DDL + INSERT through the catalog.
    engine.sql("CREATE TABLE nt(k BIGINT, label TEXT, score REAL)")
    engine.sql("INSERT INTO nt VALUES (1, 'a', CAST(0.5 AS FLOAT)), " +
      "(2, 'b', CAST(1.5 AS FLOAT))")
    val ntMax = engine.sql("SELECT MAX(score) AS m, COUNT(*) AS n FROM nt")
      .collect().head
    println(s"normal table: max=${ntMax.getFloat(0)} n=${ntMax.getLong(1)}")

    // Bulk export -> import round-trip through parquet.
    val exportDir = Files.createTempDirectory("graft_export") + "/dump"
    engine.exportParquet("events_ts", exportDir)
    val engineC = new Engine(spark, Files.createTempDirectory("graft_c").toString)
    engineC.sql("CREATE TIME SERIES TABLE events_ts(" +
      "ts TIMESTAMP, value FIELD, value_x2 FIELD AS (value * 2.0), user TAG)")
    engineC.importParquet("events_ts",
      // Import the stored columns only (generated columns are query-time).
      exportDir)
    println(s"bulk: exported=${spark.read.parquet(exportDir).count()} " +
      s"reimported=${engineC.readTable("events_ts").count()}")

    // Probe: truncate then query -> empty, table still present.
    engine.sql("TRUNCATE events_ts")
    println(s"after truncate: rows=${engine.sql("SELECT * FROM events_ts").count()} " +
      s"tables=${engine.tables()}")

    spark.stop()
  }
}
