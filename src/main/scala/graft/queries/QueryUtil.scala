package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-checked query registry.
  *
  * Correctness-gate discipline: every query that has a DuckDB oracle must be
  * bit-reproducible across engines, so
  *  - money math runs in DECIMAL (exact, identical in both engines) and is
  *    cast to DOUBLE only after rounding;
  *  - every result has a deterministic total ORDER BY on key columns;
  *  - aliases match the oracle SQL exactly (the comparator keys on names).
  */
object QueryUtil {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** events.ts has shipped in two physical shapes across testdata
    * generations: TIMESTAMP(NANOS) surfacing as Long nanoseconds, and
    * timestamp[us] surfacing as TIMESTAMP_NTZ under Spark 4.1. Normalize
    * both to a session-zone (UTC) TimestampType column at the read edge so
    * every query sees one canonical shape; data is µs-exact either way.
    */
  private def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("CAST(ts DIV 1000 AS LONG)")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }

  /** Exact decimal view of a 2-decimal double column. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Decimal aggregate back to a comparable rounded double. */
  def money(c: Column): Column = round(c.cast("double"), 2)

  /** Canonical events.ts accessors over the normalized TimestampType shape. */
  def eventsTsMicros: Column = unix_micros(col("ts"))
  def eventsTimestamp: Column = col("ts")
}
