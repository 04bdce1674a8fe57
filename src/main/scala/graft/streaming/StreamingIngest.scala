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
  * replays the batch — so the stream's highest applied batch id is
  * recorded ATOMICALLY with the segment commit in the table manifest
  * (Delta's per-appId transaction-version design): a replayed batch sees
  * itself at or below the watermark and no-ops. There is no window where
  * data is committed but the marker is not — they are one write — so the
  * streaming path carries the same exactly-once guarantee as the WAL'd
  * batch path. At scale: one micro-batch = one compression job; segment
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
    // Batch ids restart at 0 for every fresh checkpoint, so watermarks are
    // scoped to the query's checkpoint identity: a new query into the same
    // table (or two concurrent queries) would otherwise see the previous
    // query's watermark and silently skip real batches.
    val ns = checkpointNamespace(checkpointDir)
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val applied = engine.dataFolder.streamVersion(table, ns)
        if (!batch.isEmpty && applied.forall(batchId > _))
          engine.writeStreamBatch(table, batch, ns, batchId)
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
}
