package graft.tsdb

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (saves JVM startup). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE may re-plan shuffles feeding cached frames (matches Bench /
      // Verify): iterative operators cache tiny per-round frames that
      // otherwise shuffle at full width with near-empty tasks.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
