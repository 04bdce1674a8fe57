package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core._

/** Manual end-to-end drive of the compression kernel on real testdata:
  * reads events.parquet, compresses each user's (ts, value) series, grids it
  * back, and prints round-trip + compression stats.
  *
  * Run with: sbt "Test/runMain graft.tools.KernelDrive [sfDir]"
  */
object KernelDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val events = graft.queries.QueryUtil.table(spark, sfDir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS ts_us", "CAST(value AS FLOAT) AS v")
      .as[(Long, Long, Float)]
      .collect()
      .groupBy(_._1)

    var totalPoints = 0L
    var totalSegments = 0L
    var totalCompressedBytes = 0L
    var lossless_ok = true
    var boundViolations = 0

    for ((_, rows) <- events) {
      val sorted = rows.sortBy(_._2)
      val ts = sorted.map(_._2)
      val vs = sorted.map(_._3)

      // Lossless round-trip must be identity.
      val segs = Compressor.compressUnivariate(ts, vs, ErrorBound.Lossless)
      val tsBuf = new LongBuf(); val vsBuf = new FloatBuf()
      segs.foreach(s => Models.grid(s.modelTypeId, s.startTime, s.endTime,
        s.timestamps, s.minValue, s.maxValue, s.values, s.residuals, tsBuf, vsBuf))
      val rtTs = tsBuf.toArray; val rtVs = vsBuf.toArray
      if (!(rtTs.sameElements(ts) && rtVs.length == vs.length &&
            rtVs.zip(vs).forall { case (a, b) => Models.equalOrNan(a.toDouble, b.toDouble) })) {
        lossless_ok = false
        println(s"LOSSLESS MISMATCH: user series of ${ts.length} points")
      }

      // Relative-5% path must stay within bound.
      val lossySegs = Compressor.compressUnivariate(ts, vs, ErrorBound.relative(5.0f))
      val lvBuf = new FloatBuf(); val ltBuf = new LongBuf()
      lossySegs.foreach(s => Models.grid(s.modelTypeId, s.startTime, s.endTime,
        s.timestamps, s.minValue, s.maxValue, s.values, s.residuals, ltBuf, lvBuf))
      lvBuf.toArray.zip(vs).foreach { case (a, b) =>
        if (!Models.isValueWithinErrorBound(ErrorBound.relative(5.0f), b, a))
          boundViolations += 1
      }

      totalPoints += ts.length
      totalSegments += segs.length
      totalCompressedBytes += segs.map(s => Models.CompressedMetadataSizeInBytes +
        s.timestamps.length + s.values.length + s.residuals.length).sum
    }

    println(f"series=${events.size} points=$totalPoints lossless_segments=$totalSegments")
    println(f"lossless_roundtrip_ok=$lossless_ok bound_violations=$boundViolations")
    println(f"lossless_bytes=$totalCompressedBytes raw_bytes=${totalPoints * 12} " +
      f"ratio=${totalPoints * 12.0 / totalCompressedBytes}%.2f")
    spark.stop()
  }
}
