package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.tsdb.Engine

/** Continuous ingestion into time series tables via Structured Streaming.
  *
  * The reference's multi-threaded buffer pipeline (ingest threads ->
  * compression threads -> writer threads,
  * /root/reference/crates/modelardb_server/src/storage/mod.rs:246-273)
  * collapses into `foreachBatch`: each micro-batch runs the same
  * arrange-compress-append job as batch `Engine.write`, with Spark supplying
  * parallelism, back-pressure, and exactly-once bookkeeping through the
  * checkpoint. At scale: one micro-batch = one compression job; segment
  * files accumulate per `field_column` partition exactly as in batch mode.
  */
object StreamingIngest {

  /** Start writing `source` (a streaming DataFrame with the table's input
    * columns) into `table`. The caller owns the returned query's lifecycle.
    */
  def start(
      engine: Engine, table: String, source: DataFrame,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    require(source.isStreaming, "source must be a streaming DataFrame")
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) engine.write(table, batch)
      }
      .start()
  }
}
