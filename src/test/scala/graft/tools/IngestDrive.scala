package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tsdb.Engine

/** Focused ingest throughput probe: compress+write N synthetic points and
  * print points/s, with a kernel-only pass (same arranged input, compression
  * without the parquet write) to separate kernel cost from shuffle+write.
  *
  * Run: sbt 'Test/runMain graft.tools.IngestDrive [nPoints] [nSeries]'
  */
object IngestDrive {
  def main(args: Array[String]): Unit = {
    val nPoints = if (args.nonEmpty) args(0).toLong else 10000000L
    val nSeries = if (args.length > 1) args(1).toInt else 1000
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val engine = new Engine(spark, root)
    engine.sql("CREATE TIME SERIES TABLE big(ts TIMESTAMP, v FIELD(1.0%), tag TAG)")

    def timed[T](label: String)(body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $s%8.2f s  (${nPoints / s / 1e6}%.2f M pts/s)")
      (r, s)
    }

    val points = spark.range(nPoints)
      .select(
        (lit(1700000000000000L) + (col("id") / nSeries).cast("long") * 1000000L)
          .as("ts"),
        (sin(col("id") / 5000.0) * 100.0 +
          when(pmod(col("id"), lit(997)) === 0, rand(7) * 50).otherwise(0.0))
          .cast("float").as("v"),
        concat(lit("s"), pmod(col("id"), lit(nSeries)).cast("string")).as("tag"))

    // Each mode runs in its own JVM (pass it as arg 3) so stages don't
    // inherit one another's JIT and page-cache warmth.
    val mode = if (args.length > 2) args(2) else "full"
    mode match {
      case "scan" =>
        timed("projection scan only") {
          points.select(col("ts").cast("long").as("ts"),
              col("v").cast("float").as("v"), col("tag"))
            .write.format("noop").mode("overwrite").save()
        }
      case "shuffle" =>
        timed("hash shuffle, no sort") {
          points.select(col("ts").cast("long").as("ts"),
              col("v").cast("float").as("v"), col("tag"))
            .repartition(col("tag"))
            .write.format("noop").mode("overwrite").save()
        }
      case "arrange" =>
        // Isolate the arrange shuffle: same projection+repartition+sort as
        // the write path, counted without compression or parquet. Optional
        // arg 4 overrides the partition count.
        val nPart = if (args.length > 3) args(3).toInt else 0
        timed(s"arrange only (shuffle+sort p=$nPart)") {
          val proj = points.select(col("ts").cast("long").as("ts"),
              col("v").cast("float").as("v"), col("tag"))
          val rep = if (nPart > 0)
            proj.repartitionByRange(nPart, col("tag"), col("ts"))
          else proj.repartitionByRange(col("tag"), col("ts"))
          rep.sortWithinPartitions(col("tag"), col("ts"))
            .write.format("noop").mode("overwrite").save()
        }
      case "compress" =>
        // Isolate arrange + compression kernel: count segment rows, no write.
        timed("arrange + compress (no write)") {
          engine.dataFolder.compressForIngest("big", points).count()
        }
      case "full" =>
        timed("full ingest (compress+write)") {
          engine.write("big", points)
        }
        val nSegs = engine.dataFolder.segments("big").count()
        println(f"  segments: $nSegs%,d for $nPoints%,d points " +
          f"(${nPoints.toDouble / nSegs}%.1f pts/segment)")
        val n = engine.readTimeSeriesTable("big", Seq("v"),
          engine.Aggregate.Count).collect().head.getLong(0)
        assert(n == nPoints, s"COUNT $n != $nPoints")
    }
    spark.stop()
  }
}
