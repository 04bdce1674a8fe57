package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.TsQueries

/** Trace the INCLUDE MERGE statement flow of the federated bench queries:
  * per-statement arrival time and text size at the endpoint, plus total
  * wall — separates endpoint statement cost (parse + execute) from the
  * driver-side merge bookkeeping. Guide §1: measure before optimizing.
  *
  * Usage: sbt 'Test/runMain graft.tools.FederationTrace <sfDir> <sql...>'
  */
object FederationTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = TsQueries.engineFor(spark, sfDir)

    val statements = Seq(
      "SELECT user, percentile(value, 0.5) AS med, percentile(value, 0.9) AS p90, count(*) AS n FROM events_lossless GROUP BY user",
      "SELECT user, percentile(value, array(0.25, 0.5, 0.9)) AS p FROM events_lossless GROUP BY user",
      "SELECT user, percentile(value, 0.5) AS mv, percentile(value2, 0.9) AS mv2, count(*) AS n FROM events_multi GROUP BY user",
      "SELECT percentile(value, array(0.01, 0.5, 0.999)) AS p, percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS pd, count(*) AS n FROM events_lossless")

    statements.foreach { sel =>
      // warm
      runOne(spark, engine, sel, warm = true)
      runOne(spark, engine, sel, warm = false)
    }
    spark.stop()
  }

  private def runOne(spark: SparkSession, engine: graft.tsdb.Engine,
      sel: String, warm: Boolean): Unit = {
    val t0 = System.nanoTime()
    def ms = (System.nanoTime() - t0) / 1e6
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = new graft.remote.RemoteServer(engine, onStatement = { s =>
      log.add(f"  [$ms%8.1f ms] stmt arrives len=${s.length}%8d  ${s.take(60).replace('\n', ' ')}")
    })
    try {
      val df = engine.sql(s"INCLUDE MERGE '${server.address}' " + sel)
      log.add(f"  [$ms%8.1f ms] engine.sql returned")
      df.write.format("noop").mode("overwrite").save()
      log.add(f"  [$ms%8.1f ms] noop write done")
    } finally server.close()
    if (!warm) {
      println(s"== $sel")
      log.forEach(println(_))
    }
  }
}
