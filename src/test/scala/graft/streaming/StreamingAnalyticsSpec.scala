package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.tsdb.SparkTestSession

class StreamingAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("watermarked windowed aggregates over a memory stream") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Long, String, Double)]
    val events = stream.toDF().toDF("ts_us", "key", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))

    val agg = StreamingAnalytics.windowedStats(
      events, "ts", "key", "value", windowDuration = "1 minute")

    val base = 1700000000000000L // on a minute boundary or not is irrelevant
    stream.addData(
      (base, "a", 1.0), (base + 10_000_000L, "a", 2.0), // same minute
      (base + 90_000_000L, "a", 5.0), // next minute
      (base + 5_000_000L, "b", 7.0))

    val query = agg.writeStream
      .outputMode("complete")
      .format("memory").queryName("win_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_win_ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination(60000)

    val out = spark.sql("SELECT key, n, total FROM win_out ORDER BY key, total")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("a", 2L, 3.0), ("a", 1L, 5.0), ("b", 1L, 7.0)))
  }

  test("streaming read reconstructs appended segments as micro-batches") {
    import spark.implicits._
    val engine = new graft.tsdb.Engine(spark,
      Files.createTempDirectory("graft_stream_read").toString)
    engine.sql("CREATE TIME SERIES TABLE sr(ts TIMESTAMP, v FIELD, tag TAG)")

    def points(offset: Int, n: Int) = (0 until n)
      .map(i => (1700000000000000L + (offset + i) * 1000000L,
        (offset + i).toFloat, s"u${i % 2}"))
      .toDF("ts", "v", "tag")
    engine.write("sr", points(0, 500))
    engine.write("sr", points(500, 300))

    val stream = engine.readTableStream("sr", "v")
    assert(stream.isStreaming)
    val query = stream.writeStream
      .outputMode("append")
      .format("memory").queryName("grid_stream_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sr_ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination(60000)

    val out = spark.sql(
      "SELECT COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS s FROM grid_stream_out")
      .collect().head
    assert(out.getLong(0) == 800L,
      s"all appended segments must reconstruct, got ${out.getLong(0)}")
    assert(out.getDouble(1) == (0 until 800).sum.toDouble)
  }

  test("OPTIMIZE mid-stream re-delivers nothing; uncommitted files invisible") {
    import spark.implicits._
    val engine = new graft.tsdb.Engine(spark,
      Files.createTempDirectory("graft_stream_opt").toString)
    engine.sql("CREATE TIME SERIES TABLE so(ts TIMESTAMP, v FIELD, tag TAG)")

    def points(offset: Int, n: Int) = (0 until n)
      .map(i => (1700000000000000L + (offset + i) * 1000000L,
        (offset + i).toFloat, s"u${i % 2}"))
      .toDF("ts", "v", "tag")
    engine.write("so", points(0, 500))
    engine.write("so", points(500, 300))

    val query = engine.readTableStream("so", "v").writeStream
      .outputMode("append")
      .format("memory").queryName("opt_stream_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_so_ckpt").toString)
      .start()
    try {
      query.processAllAvailable()
      def count() = spark.sql("SELECT COUNT(*) FROM opt_stream_out")
        .collect().head.getLong(0)
      assert(count() == 800L, "both appends delivered before OPTIMIZE")

      // OPTIMIZE rewrites committed points into new files inside the same
      // partition dirs — the exact workload that double-delivered through
      // the old directory stream.
      val (compacted, created) = engine.dataFolder.compact("so")
      assert(compacted >= 2 && created >= 1, "compaction must actually run")
      query.processAllAvailable()
      assert(count() == 800L,
        s"OPTIMIZE re-delivered compacted points: ${count()} rows after it")

      // A killed append's moved-but-never-committed file: visible to a
      // directory listing, absent from every manifest — the stream must
      // not deliver it either.
      val dir = engine.dataFolder.tableDir("so")
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val live = graft.tsdb.TableManifest.latest(fs, dir).get.files.head
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(dir, live), fs,
        new org.apache.hadoop.fs.Path(dir,
          live.replaceAll("[^/]+$", "part-orphan-from-killed-append.parquet")),
        false, spark.sparkContext.hadoopConfiguration)
      query.processAllAvailable()
      assert(count() == 800L, "uncommitted droppings must stay invisible")

      // Post-OPTIMIZE appends still flow.
      engine.write("so", points(800, 200))
      query.processAllAvailable()
      assert(count() == 1000L, "appends after OPTIMIZE must still stream")
      val sum = spark.sql("SELECT CAST(SUM(v) AS DOUBLE) FROM opt_stream_out")
        .collect().head.getDouble(0)
      assert(sum == (0 until 1000).sum.toDouble,
        "delivered exactly the appended points, each once")
    } finally query.stop()
  }

  test("streaming dedup drops repeated payloads within the watermark") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("ts_us", "text")
      .withColumn("ts", timestamp_micros(col("ts_us")))

    val deduped = StreamingAnalytics.dedupStream(docs, "ts", Seq("text"))

    val base = 1700000000000000L
    stream.addData(
      (base, "alpha"), (base + 1_000_000L, "alpha"), // dup in-batch
      (base + 2_000_000L, "beta"))
    stream.addData(
      (base + 3_000_000L, "alpha"),                  // dup across batches
      (base + 4_000_000L, "gamma"))

    val query = deduped.writeStream
      .outputMode("append")
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_dedup_ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination(60000)

    val out = spark.sql("SELECT text FROM dedup_out ORDER BY text")
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("alpha", "beta", "gamma"))
  }

  test("stateful sessionization closes sessions on gaps") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[StreamingAnalytics.SessionEvent]
    val sessions = StreamingAnalytics.sessionize(
      stream.toDS(), gapMicros = 60_000_000L) // 1 minute gap

    val base = 1700000000000000L
    // Session 1: three events within the gap; then a 5-minute jump starts
    // session 2 — the first session closes immediately on the gap.
    stream.addData(
      StreamingAnalytics.SessionEvent("u1", base, 1.0),
      StreamingAnalytics.SessionEvent("u1", base + 30_000_000L, 2.0),
      StreamingAnalytics.SessionEvent("u1", base + 50_000_000L, 3.0),
      StreamingAnalytics.SessionEvent("u1", base + 350_000_000L, 4.0))

    val query = sessions.writeStream
      .outputMode("append")
      .format("memory").queryName("sess_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sess_ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination(60000)

    val closed = spark.sql("SELECT key, nEvents, total, durationMicros FROM sess_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(closed.toSeq == Seq(("u1", 3L, 6.0, 50_000_000L)))
  }
}
