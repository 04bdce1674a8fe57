package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{FloatBuf, LongBuf, Models}

/** Builds the logical (data-point) view of a time series table from its
  * compressed segments: segment pruning on rewritten time predicates,
  * per-segment reconstruction ("gridding"), multi-field reassembly, and
  * generated columns.
  *
  * Spark-first equivalent of the reference's scan pipeline
  * (TimeSeriesTable -> GridExec -> SortedJoinExec -> GeneratedAsExec,
  * /root/reference/crates/modelardb_storage/src/query/time_series_table.rs:486-700):
  * the positional zip becomes either a direct select (one field) or one
  * shuffle-assembly by (tags, timestamp); Catalyst handles projection
  * pruning and everything downstream.
  */
object GridView {

  /** Rewrite an inclusive time range on the logical timestamp into a
    * segment-schema predicate — the reference's timestamp-filter rewrite
    * (time_series_table.rs:265-373): `ts >= lo` => `end_time >= lo`,
    * `ts <= hi` => `start_time <= hi`. Inexact: callers must re-apply the
    * exact filter after gridding.
    */
  def segmentTimePredicate(startMicros: Option[Long], endMicros: Option[Long]): Column = {
    val lower = startMicros.map(lo => col("end_time") >= lo)
    val upper = endMicros.map(hi => col("start_time") <= hi)
    (lower.toSeq ++ upper.toSeq).reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Reconstruct data points for the requested stored fields.
    *
    * @param segments  pre-filtered segment DataFrame (time/tag predicates
    *                  already applied; caller prunes `field_column`)
    * @return DataFrame with columns (timestamp: Timestamp, field..., tags...)
    *         in logical-schema order restricted to `fields` + generated
    *         columns derivable from them.
    */
  def dataPoints(
      segments: DataFrame, meta: TableMetadata, fields: Seq[String],
      startMicros: Option[Long] = None, endMicros: Option[Long] = None): DataFrame = {
    val tagNames = meta.tagColumns
    val fieldIdx = fields.map(meta.fieldIndex)
    val points = explodedPoints(segments, meta, fields, startMicros, endMicros)

    val tagCols = tagNames.map(col)
    val assembled =
      if (fields.size == 1) {
        points.select(
          (col("__graft_ts") +: col("__graft_value").as(fields.head) +: tagCols): _*)
      } else {
        // One shuffle reassembles the multivariate rows: conditional
        // aggregation instead of N-1 joins of the per-field point sets.
        val aggs = fields.zip(fieldIdx).map { case (name, i) =>
          max(when(col(SegmentSchema.FieldColumn) === i, col("__graft_value"))).as(name)
        }
        points
          .groupBy((col("__graft_ts") +: tagCols): _*)
          .agg(aggs.head, aggs.tail: _*)
          // Match the reference's zip semantics: rows missing any stored
          // field are dropped (sorted_join_exec.rs truncates to shortest).
          .where(fields.map(col(_).isNotNull).reduce(_ && _))
      }

    withGeneratedAndOrder(assembled, meta, fields)
  }

  /** Reconstructed points before multivariate reassembly: one row per
    * (timestamp, field) with columns (__graft_ts, __graft_value, tags...,
    * field_column), exact time filter already applied. Aggregations that
    * want per-field partials (hybrid range aggregates) must use this frame:
    * the reassembly in [[dataPoints]] drops rows missing any field, which
    * is wrong for boundary segments that split at different timestamps per
    * field.
    */
  private[graft] def explodedPoints(
      segments: DataFrame, meta: TableMetadata, fields: Seq[String],
      startMicros: Option[Long] = None, endMicros: Option[Long] = None): DataFrame = {
    val tagNames = meta.tagColumns
    val fieldIdx = fields.map(meta.fieldIndex)

    val pruned = segments
      .where(col(SegmentSchema.FieldColumn).isin(fieldIdx.map(i => i: Any): _*))
      .where(segmentTimePredicate(startMicros, endMicros))

    // Per-segment reconstruction with the native GridPoints generator:
    // rows stream straight out of the decode buffers inside the Generate
    // operator, and the plan around it stays in whole-stage codegen. No
    // typed mapPartitions (that would force a Deserialize/Serialize
    // boundary) and no per-point boxing.
    import org.apache.spark.sql.graft.ColumnBridge
    def attr(name: String) = ColumnBridge.expression(col(name))
    val gridded = pruned
      .select(
        (ColumnBridge.column(GridPoints(
            attr("model_type_id"), attr("start_time"), attr("end_time"),
            attr("timestamps"), attr("min_value"), attr("max_value"),
            attr("values"), attr("residuals"))) +:
          tagNames.map(col) :+
          col(SegmentSchema.FieldColumn)): _*)

    // Exact post-grid re-filter: the segment-level predicate is inexact.
    val exact = (startMicros.map(lo => col("__graft_ts") >= lo).toSeq ++
      endMicros.map(hi => col("__graft_ts") <= hi).toSeq)
      .reduceOption(_ && _).getOrElse(lit(true))
    gridded.where(exact)
  }

  /** Per-bucket partial aggregates straight from the decode generator: one
    * row per (segment, overlapped bucket) with columns (__graft_bucket,
    * __bp_cnt, __bp_sum, __bp_min, __bp_max, tags..., field_column) —
    * range clipping applied exactly inside the generator. The companion of
    * [[explodedPoints]] for aggregating consumers: the point stream never
    * materializes.
    */
  private[graft] def bucketPartials(
      segments: DataFrame, meta: TableMetadata, fields: Seq[String],
      bucketUs: Long, startMicros: Option[Long] = None,
      endMicros: Option[Long] = None, withEdges: Boolean = false): DataFrame = {
    val fieldIdx = fields.map(meta.fieldIndex)
    val pruned = segments
      .where(col(SegmentSchema.FieldColumn).isin(fieldIdx.map(i => i: Any): _*))
      .where(segmentTimePredicate(startMicros, endMicros))

    import org.apache.spark.sql.graft.ColumnBridge
    def attr(name: String) = ColumnBridge.expression(col(name))
    pruned.select(
      (ColumnBridge.column(BucketPartials(bucketUs, startMicros, endMicros,
          withEdges,
          attr("model_type_id"), attr("start_time"), attr("end_time"),
          attr("timestamps"), attr("min_value"), attr("max_value"),
          attr("values"), attr("residuals"))) +:
        meta.tagColumns.map(col) :+
        col(SegmentSchema.FieldColumn)): _*)
  }

  /** Add derivable generated columns and project to logical-schema order. */
  private def withGeneratedAndOrder(
      df: DataFrame, meta: TableMetadata, fields: Seq[String]): DataFrame = {
    val tsName = meta.timestampColumn
    val available = fields.toSet ++ meta.tagColumns.toSet + tsName
    var out = df.withColumn(tsName, timestamp_micros(col("__graft_ts"))).drop("__graft_ts")

    val generated = meta.generatedColumns.filter { g =>
      // Only generate columns whose source columns are all present.
      extractIdentifiers(g.generatedExpr).forall(id =>
        available.contains(id) || !meta.columns.exists(_.name == id))
    }
    generated.foreach { g =>
      out = out.withColumn(g.name, expr(g.generatedExpr).cast(FloatType))
    }

    val order = meta.columns.map(_.name).filter(n =>
      available.contains(n) || generated.exists(_.name == n))
    out.select(order.map(col): _*)
  }

  /** Crude identifier scan for generated-column source closure. */
  private def extractIdentifiers(sqlExpr: String): Seq[String] =
    "[A-Za-z_][A-Za-z0-9_]*".r.findAllIn(sqlExpr).toSeq.distinct

}
