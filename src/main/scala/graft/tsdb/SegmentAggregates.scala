package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Models, TimestampCodec}

/** Segment-native aggregates: COUNT/MIN/MAX/SUM/AVG of one field computed
  * directly from segment metadata and models, skipping reconstruction.
  *
  * Spark-first port of the reference's `ModelSimpleAggregates` physical
  * optimizer rule
  * (/root/reference/crates/modelardb_storage/src/optimizer/model_simple_aggregates.rs:175-618):
  * instead of swapping physical operators, the facade emits the aggregate
  * over the segment DataFrame — MIN/MAX reduce to built-ins over the
  * metadata columns, COUNT/SUM go through a codegen'd-adjacent UDF per
  * segment with Spark's native partial aggregation on top.
  */
object SegmentAggregates {

  import org.apache.spark.sql.graft.ColumnBridge

  private def attr(name: String) = ColumnBridge.expression(col(name))

  /** Data points represented by a segment, decoded without gridding. */
  def lenCol: Column = ColumnBridge.column(
    SegmentLen(attr("start_time"), attr("end_time"), attr("timestamps")))

  /** Sum of a segment's values, f64-accumulated so the cross-segment total
    * matches an exact engine summing the reconstructed values.
    */
  def sumCol: Column = ColumnBridge.column(SegmentSum(
    attr("model_type_id"), attr("start_time"), attr("end_time"),
    attr("timestamps"), attr("min_value"), attr("max_value"),
    attr("values"), attr("residuals")))

  /** The aggregate column for one kind ("count" | "min" | "max" | "sum" |
    * "avg") over one field's segments within a mixed-field frame — the
    * single source of truth shared by the facade and the Catalyst rewrite.
    */
  def aggColumnFor(kind: String, fieldIndex: Int): Column = {
    val onField = (c: Column) =>
      when(col(SegmentSchema.FieldColumn) === fieldIndex, c)
    kind match {
      case "count" => coalesce(sum(onField(lenCol)), lit(0L))
      case "min" => org.apache.spark.sql.functions.min(onField(col("min_value")))
      case "max" => org.apache.spark.sql.functions.max(onField(col("max_value")))
      case "sum" => sum(onField(sumCol))
      case "avg" => sum(onField(sumCol)) / sum(onField(lenCol))
      case other => throw new IllegalArgumentException(s"Unknown aggregate $other.")
    }
  }

  /** `SELECT count(field) FROM t` on segments of one field column. */
  def count(segments: DataFrame, fieldIndex: Int): DataFrame =
    perField(segments, fieldIndex).agg(coalesce(sum(lenCol), lit(0L)).as("count"))

  def min(segments: DataFrame, fieldIndex: Int): DataFrame =
    perField(segments, fieldIndex)
      .agg(org.apache.spark.sql.functions.min("min_value").as("min"))

  def max(segments: DataFrame, fieldIndex: Int): DataFrame =
    perField(segments, fieldIndex)
      .agg(org.apache.spark.sql.functions.max("max_value").as("max"))

  def sumOf(segments: DataFrame, fieldIndex: Int): DataFrame =
    perField(segments, fieldIndex).agg(sum(sumCol).as("sum"))

  def avg(segments: DataFrame, fieldIndex: Int): DataFrame =
    perField(segments, fieldIndex)
      .agg((sum(sumCol) / sum(lenCol)).as("avg"))

  private def perField(segments: DataFrame, fieldIndex: Int): DataFrame =
    segments.where(col(SegmentSchema.FieldColumn) === fieldIndex)
}
