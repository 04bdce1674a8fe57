package graft.tsdb

import org.apache.spark.sql.types._

/** Physical schema of compressed-segment tables. Mirrors the reference's
  * segment schema (/root/reference/crates/modelardb_types/src/schemas.rs:40-52)
  * with `start_time`/`end_time` held as microsecond longs (sortable,
  * min/max-stats friendly) plus the denormalized tag columns and the
  * `field_column` partition column.
  */
object SegmentSchema {
  val FieldColumn = "field_column"

  val baseFields: Seq[StructField] = Seq(
    StructField("model_type_id", ByteType, nullable = false),
    StructField("start_time", LongType, nullable = false),
    StructField("end_time", LongType, nullable = false),
    StructField("timestamps", BinaryType, nullable = false),
    StructField("min_value", FloatType, nullable = false),
    StructField("max_value", FloatType, nullable = false),
    StructField("values", BinaryType, nullable = false),
    StructField("residuals", BinaryType, nullable = false),
    StructField("error", FloatType, nullable = false))

  /** Full on-disk schema for a table with the given tag columns. */
  def forTags(tagColumns: Seq[String]): StructType =
    StructType(
      baseFields ++
        tagColumns.map(t => StructField(t, StringType, nullable = false)) :+
        StructField(FieldColumn, IntegerType, nullable = false))
}
