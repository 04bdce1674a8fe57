package graft.tsdb

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL extensions beyond the base DDL: INSERT INTO routing through the
  * compression path, INCLUDE federation, the Catalyst segment-aggregate
  * rewrite for arbitrary SQL, and streaming ingest.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def newEngine(): Engine =
    new Engine(spark, Files.createTempDirectory("graft_sql").toString)

  test("insert into a time series table via SQL values and select") {
    val engine = newEngine()
    engine.sql("CREATE TIME SERIES TABLE ins(ts TIMESTAMP, v FIELD, tag TAG)")
    engine.sql("INSERT INTO ins VALUES " +
      "(TIMESTAMP '2024-01-01 00:00:00', CAST(1.5 AS FLOAT), 'a')," +
      "(TIMESTAMP '2024-01-01 00:00:01', CAST(2.5 AS FLOAT), 'a')," +
      "(TIMESTAMP '2024-01-01 00:00:02', CAST(3.5 AS FLOAT), 'b')")
    val rows = engine.sql("SELECT tag, COUNT(*) AS n FROM ins GROUP BY tag ORDER BY tag")
      .collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("b", 1L)))

    engine.sql("INSERT INTO ins SELECT ts, v + CAST(10.0 AS FLOAT), tag FROM ins")
    assert(engine.sql("SELECT COUNT(*) AS n FROM ins").collect().head.getLong(0) == 6L)
  }

  test("include federates a query over a second data folder") {
    val engineA = newEngine()
    val engineB = newEngine()
    for (e <- Seq(engineA, engineB)) {
      e.sql("CREATE TIME SERIES TABLE f(ts TIMESTAMP, v FIELD, tag TAG)")
      e.sql("INSERT INTO f VALUES (TIMESTAMP '2024-01-01 00:00:00', " +
        "CAST(1.0 AS FLOAT), 'x')")
    }
    val rows = engineA.sql(
      s"INCLUDE '${engineB.root}' SELECT tag, v FROM f").collect()
    assert(rows.length == 2)
  }

  test("segment-aggregate rewrite answers simple SQL without gridding") {
    val engine = newEngine()
    engine.sql("CREATE TIME SERIES TABLE sa(ts TIMESTAMP, v FIELD, tag TAG)")
    val rng = new scala.util.Random(1)
    import spark.implicits._
    val df = (0 until 2000).map(i =>
      (1700000000000000L + i * 1000000L, rng.nextFloat() * 100, s"t${i % 3}"))
      .toDF("ts", "v", "tag")
    engine.write("sa", df)

    val sqlDf = engine.sql(
      "SELECT COUNT(v) AS n, MIN(v) AS mn, MAX(v) AS mx, SUM(v) AS s, AVG(v) AS a FROM sa")
    // The rewritten plan must not reconstruct points.
    val planText = sqlDf.queryExecution.executedPlan.toString
    assert(!planText.contains("Generate"),
      s"expected segment-native plan, got:\n$planText")

    val viaSql = sqlDf.collect().head
    val gridded = engine.readTable("sa")
      .agg(count(col("v")), min(col("v")), max(col("v")), sum(col("v")), avg(col("v")))
      .collect().head
    assert(viaSql.getLong(0) == gridded.getLong(0))
    assert(viaSql.getFloat(1) == gridded.getFloat(1))
    assert(viaSql.getFloat(2) == gridded.getFloat(2))
    assert(math.abs(viaSql.getDouble(3) - gridded.getDouble(3)) <=
      math.abs(gridded.getDouble(3)) * 1e-5)
    assert(math.abs(viaSql.getDouble(4) - gridded.getDouble(4)) <=
      math.abs(gridded.getDouble(4)) * 1e-5)

    // Tag-grouped variant also rewrites.
    val grouped = engine.sql(
      "SELECT tag, COUNT(v) AS n FROM sa GROUP BY tag ORDER BY tag")
    val g = grouped.collect()
    assert(g.map(_.getLong(1)).sum == 2000L)

    // A WHERE clause must block the rewrite (inexact on segments) but still
    // return correct results through the grid.
    val filtered = engine.sql("SELECT COUNT(v) AS n FROM sa WHERE tag = 't0'")
    val filteredPlan = filtered.queryExecution.executedPlan.toString
    assert(filteredPlan.contains("Generate"),
      "filtered aggregate must go through reconstruction")
    assert(filtered.collect().head.getLong(0) ==
      engine.readTable("sa").where(col("tag") === "t0").count())
  }

  test("create normal table via SQL with reference type aliases") {
    val engine = newEngine()
    engine.sql("CREATE TABLE normal_table(timestamp TIMESTAMP, values REAL, metadata REAL)")
    assert(engine.tables() == Seq("normal_table"))
    assert(engine.schema("normal_table").fieldNames.toSeq ==
      Seq("timestamp", "values", "metadata"))
    engine.sql("INSERT INTO normal_table SELECT TIMESTAMP '2024-01-01', " +
      "CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)")
    assert(engine.sql("SELECT COUNT(*) AS n FROM normal_table")
      .collect().head.getLong(0) == 1L)
  }

  test("streaming ingest compresses micro-batches into the table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val engine = newEngine()
    engine.sql("CREATE TIME SERIES TABLE st(ts TIMESTAMP, v FIELD, tag TAG)")

    val stream = MemoryStream[(Long, Float, String)]
    val source = stream.toDF().toDF("ts", "v", "tag")
    val checkpoint = Files.createTempDirectory("graft_ckpt").toString
    val query = graft.streaming.StreamingIngest.start(
      engine, "st", source, checkpoint,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())

    stream.addData((0 until 500).map(i =>
      (1700000000000000L + i * 1000000L, i.toFloat, s"u${i % 2}")))
    query.awaitTermination(60000)

    assert(engine.sql("SELECT COUNT(*) AS n FROM st").collect().head.getLong(0) == 500L)
    val segs = engine.dataFolder.segments("st").count()
    assert(segs > 0 && segs < 500, s"expected compressed segments, got $segs")
  }
}
