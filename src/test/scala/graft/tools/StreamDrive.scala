package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingAnalytics

/** Manual drive: a real file-based readStream over events.parquet through
  * windowed aggregation and sessionization, cross-checked against the batch
  * equivalents.
  *
  * Run with: sbt "Test/runMain graft.tools.StreamDrive [sfDir]"
  */
object StreamDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    val schema = batch.schema

    // File streaming sources ingest directories: stage the file into one.
    val streamDir = Files.createTempDirectory("sd_events")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))

    val streamed = spark.readStream.schema(schema)
      .parquet(streamDir.toString)
      .select(col("ts").cast("timestamp").as("ts"),
        col("event_type"), col("value"))

    val agg = StreamingAnalytics.windowedStats(
      streamed, "ts", "event_type", "value", windowDuration = "1 hour")
    val q1 = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_win")
      .option("checkpointLocation", Files.createTempDirectory("sd_ckpt1").toString)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000)

    val streamTotal = spark.sql(
      "SELECT SUM(n) AS n, COUNT(*) AS windows FROM stream_win").collect().head
    val batchWindows = batch
      .select(col("ts").cast("timestamp").as("ts"),
        col("event_type"), col("value"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()
    println(s"windowed: stream events=${streamTotal.getLong(0)} " +
      s"windows=${streamTotal.getLong(1)} | batch windows=${batchWindows.count()} " +
      s"raw events=${batch.count()}")

    // Sessionization over the same stream (per event_type, 10-minute gap).
    val sessionEvents = spark.readStream.schema(schema)
      .parquet(streamDir.toString)
      .select(col("event_type").as("key"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"),
        col("value").as("value"))
      .as[StreamingAnalytics.SessionEvent]
    val sessions = StreamingAnalytics.sessionize(
      sessionEvents, gapMicros = 10L * 60 * 1000000)
    val q2 = sessions.writeStream.outputMode("append")
      .format("memory").queryName("stream_sess")
      .option("checkpointLocation", Files.createTempDirectory("sd_ckpt2").toString)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)

    val sess = spark.sql("SELECT COUNT(*) AS n, SUM(nEvents) AS ev, " +
      "MIN(durationMicros) AS mind, MAX(durationMicros) AS maxd FROM stream_sess")
      .collect().head
    println(s"sessions: closed=${sess.getLong(0)} events_in_closed=${sess.getLong(1)} " +
      s"duration_us=[${sess.getLong(2)}, ${sess.getLong(3)}]")

    spark.stop()
  }
}
