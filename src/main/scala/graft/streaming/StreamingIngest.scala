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
  * arrange-compress-append job as batch `Engine.write`. foreachBatch alone
  * is at-least-once — a crash between the append and the checkpoint commit
  * replays the batch — so a per-table batch-id marker in the data folder
  * makes replays no-ops (append-only sink + idempotence = effectively
  * exactly-once). At scale: one micro-batch = one compression job; segment
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
    // Batch ids restart at 0 for every fresh checkpoint, so markers must be
    // scoped to the query's checkpoint identity: a new query into the same
    // table (or two concurrent queries) would otherwise see the previous
    // query's markers and silently skip real batches.
    val ns = checkpointNamespace(checkpointDir)
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty && !batchSeen(engine, table, ns, batchId)) {
          engine.write(table, batch)
          markBatchDone(engine, table, ns, batchId)
        }
      }
      .start()
  }

  /** Stable hex digest of the canonicalized checkpoint location. */
  private def checkpointNamespace(checkpointDir: String): String = {
    val canonical = new org.apache.hadoop.fs.Path(checkpointDir).toUri.toString
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(canonical.getBytes("UTF-8"))
    digest.take(8).map(b => f"$b%02x").mkString
  }

  private def batchMarker(engine: Engine, table: String, ns: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(
      s"${engine.root}/streaming/$table/cp_$ns/batch_$batchId")

  /** True if this batch id already committed (a replayed batch). The marker
    * is written after the append's atomic job commit, so replays are
    * skipped instead of double-appended; the unprotected window is only the
    * instant between job commit and marker creation.
    */
  private def batchSeen(
      engine: Engine, table: String, ns: String, batchId: Long): Boolean = {
    val path = batchMarker(engine, table, ns, batchId)
    path.getFileSystem(engine.spark.sparkContext.hadoopConfiguration).exists(path)
  }

  private def markBatchDone(
      engine: Engine, table: String, ns: String, batchId: Long): Unit = {
    val path = batchMarker(engine, table, ns, batchId)
    val fs = path.getFileSystem(engine.spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    out.close()
  }
}
