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

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Exact decimal view of a 2-decimal double column. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Decimal aggregate back to a comparable rounded double. */
  def money(c: Column): Column = round(c.cast("double"), 2)

  /** events.ts is read as Long nanoseconds (TIMESTAMP(NANOS) parquet);
    * normalize to a microsecond timestamp.
    */
  def eventsTsMicros: Column = expr("CAST(ts DIV 1000 AS LONG)")
  def eventsTimestamp: Column = timestamp_micros(eventsTsMicros)
}
