package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.arrow.ArrowConverters

/** Bridge into Spark's `private[sql]` Arrow plumbing: query results as
  * self-describing Arrow IPC byte batches and back. This is the same
  * conversion PySpark rides for `collectAsArrow`/`createDataFrame`, reused
  * here as the wire format of the remote SQL surface (the reference ships
  * result sets the same way — Arrow record batches over its Flight
  * endpoint, /root/reference/crates/modelardb_server/src/remote.rs:636-745).
  */
object ArrowBridge {

  /** Lazily encode a DataFrame's result as Arrow IPC batches, each batch
    * self-describing (schema + records): rows stream off the executed plan
    * partition by partition, so server memory is bounded by one batch.
    */
  def toBatches(df: DataFrame, maxRecordsPerBatch: Int = 8192,
      maxBatchBytes: Long = 16L * 1024 * 1024): Iterator[Array[Byte]] = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val timeZone = ds.sparkSession.sessionState.conf.sessionLocalTimeZone
    val schema = ds.schema
    val batches = ArrowConverters.toBatchWithSchemaIterator(
      ds.queryExecution.executedPlan.executeToIterator(), schema,
      maxRecordsPerBatch.toLong, maxBatchBytes, timeZone,
      true, false)
    if (batches.hasNext) batches
    else Iterator.single( // empty results still carry their schema
      ArrowConverters.createEmptyArrowBatch(schema, timeZone, true, false))
  }

  /** Decode self-describing Arrow IPC batches into a local DataFrame (the
    * schema rides in the batches themselves). Decoded rows are views over
    * the Arrow buffers, so each is copied through an UnsafeProjection
    * before the buffers are released.
    */
  def fromBatches(spark: SparkSession, batches: Iterator[Array[Byte]]): DataFrame = {
    val session = spark.asInstanceOf[classic.SparkSession]
    val (rowIter, schema) = ArrowConverters.fromBatchWithSchemaIterator(
      batches, org.apache.spark.TaskContext.get())
    val projection =
      org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
    val rows = rowIter.map(r => projection(r).copy()
      : org.apache.spark.sql.catalyst.InternalRow).toArray
    // Slice large decoded results so downstream transforms parallelize
    // instead of inheriting one fat partition.
    val slices = math.max(1, math.min(32, rows.length / 8192))
    session.internalCreateDataFrame(
      session.sparkContext.parallelize(rows.toSeq, slices), schema)
  }
}
