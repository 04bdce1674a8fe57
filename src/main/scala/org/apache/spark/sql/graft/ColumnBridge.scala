package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved `Column` to a ColumnNode facade; converting to/from
  * catalyst `Expression`s goes through `classic.ExpressionUtils`, which is
  * `private[sql]`. This bridge (in the `org.apache.spark.sql` namespace,
  * the conventional extension point for libraries that supply custom
  * expressions) re-exports just the two converters the engine needs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `Dataset.ofRows` is likewise `private[sql]` in Spark 4: re-exported here
  * so the engine can turn a transformed logical plan (e.g. an aggregate
  * subtree swapped for its segment-native equivalent) back into a
  * DataFrame.
  */
object PlanBridge {
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `internalCreateDataFrame` is `private[sql]`: re-exported so hot
    * `mapPartitions` kernels (the ingest compressor) can consume and emit
    * `InternalRow`s directly instead of paying the external-Row
    * deserialize/re-encode round trip on every data point.
    */
  def ofInternalRows(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
