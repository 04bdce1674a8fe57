package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over event streams: watermarked windowed aggregates
  * and stateful sessionization — the readStream -> transform -> writeStream
  * side of the engine (the reference is batch-only; this is part of the
  * Spark-first surface).
  *
  * Scale shapes: windowed aggregation is Spark's native streaming
  * hash-aggregate with state store per (window, key); sessionization keeps
  * one small state record per active key with an idle timeout, so state is
  * bounded by the number of concurrently-active keys, not history.
  */
object StreamingAnalytics {

  /** Watermarked tumbling-window aggregate of a value column.
    *
    * @param events streaming DataFrame with (tsCol: Timestamp, keyCol, valueCol)
    */
  def windowedStats(
      events: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      windowDuration: String = "5 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("total"),
        min(col(valueCol)).as("mn"),
        max(col(valueCol)).as("mx"))

  /** Streaming exact dedup: drop rows whose payload content was already
    * seen, with the dedup state bounded by the event-time watermark
    * (dropDuplicatesWithinWatermark) instead of growing forever — the
    * streaming counterpart of `ops.Dedup.dropExactDuplicates` for
    * continuous corpus ingestion.
    */
  def dedupStream(
      source: DataFrame, tsCol: String, payloadCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    source
      .withColumn("__content_hash",
        md5(concat_ws(" ", payloadCols.map(col): _*)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")

  /** Prebuilt corpus side of [[screenStream]]: the MinHash LSH band index
    * plus the shingle sets the exact-Jaccard verify reads. Build it ONCE
    * and `persist()` it — a stream-static join re-evaluates the static
    * side every micro-batch (Spark's contract), and without the pin each
    * batch would re-run the MinHash kernel over the whole corpus (the
    * per-batch cost then grows linearly with corpus size — measured 4.3 s
    * → 22 s per batch for a 4× corpus in OpsScaleDrive before this
    * existed). `unpersist()` when the query stops.
    */
  final case class ScreenIndex(banded: DataFrame, content: DataFrame) {
    def persist(): this.type = {
      banded.persist(); content.persist()
      // Materialize now: the first micro-batch shouldn't pay the build.
      banded.count(); content.count()
      this
    }
    def unpersist(): Unit = { banded.unpersist(); content.unpersist() }
  }

  /** Build the static-corpus index [[screenStream]] probes. */
  def screenIndex(
      corpus: DataFrame, refIdCol: String, refTextCol: String,
      numHashes: Int = 128, bands: Int = 16, shingleK: Int = 3): ScreenIndex = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    ScreenIndex(
      graft.ops.Dedup
        .minhashBands(corpus, refIdCol, refTextCol, numHashes, bands, shingleK)
        .toDF("ref_id", "band", "band_hash"),
      corpus.select(col(refIdCol).as("ref_id"),
        graft.ops.Dedup.shinglesCol(col(refTextCol), shingleK).as("__sh_ref")))
  }

  /** STREAMING near-duplicate screen against a static reference corpus —
    * the continuous form of training-data decontamination: every document
    * flowing through the stream is checked against a benchmark/eval set
    * and flagged with its matching reference document and exact n-gram
    * Jaccard. Returns (doc_id, ref_id, jaccard) rows for matches at or
    * above `threshold`, one row per matching pair per micro-batch.
    *
    * Scale shape: a STATELESS stream-static equi-join on MinHash LSH band
    * keys — no watermark, no streaming state store. The stream side
    * computes signatures in a narrow one-pass compiled kernel; only
    * colliding (band, key) candidates are verified with exact shingle
    * Jaccard, so per-batch cost is proportional to candidates, never
    * |batch| × |corpus|. A pair colliding in several bands is collapsed
    * to one output row WITHOUT streaming state: collisions repartition by
    * pair and a per-partition (per-batch) hash set keeps the first — the
    * only cross-batch identity is the caller's doc_id. The corpus rides a
    * persisted, BROADCAST [[ScreenIndex]] (benchmark/eval corpora are
    * broadcast-sized; per-batch time is then flat in corpus size — no
    * per-batch corpus shuffle or kernel re-run). For corpora too large to
    * broadcast, screen in batch with the pair finder instead.
    */
  def screenStream(
      stream: DataFrame, idCol: String, textCol: String,
      index: ScreenIndex, threshold: Double, numHashes: Int, bands: Int,
      shingleK: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val sBanded = stream.select(
      col(idCol).as("doc_id"),
      graft.ops.Dedup.shinglesCol(col(textCol), shingleK).as("__sh"),
      posexplode(graft.ops.Dedup.minhashBandKeysCol(
        col(textCol), numHashes, bands, shingleK))
        .as(Seq("band", "band_hash")))
    val cBanded = broadcast(index.banded)
    val cContent = broadcast(index.content)
    // Candidate pairs are deduped per batch BEFORE the corpus-content join
    // and the exact-Jaccard verify: a pair colliding in several bands would
    // otherwise pay the verify kernel once per colliding band (up to
    // `bands`×) and drag both shingle arrays through the join that many
    // times. The dedup is stateless (no streaming state store): multi-band
    // collisions of one pair land in one partition and a transient hash set
    // keeps the first. The stream side's shingles ride along — they are
    // identical across a pair's collisions, and re-deriving them after the
    // dedup would need a stream-stream self-join, which is not stateless.
    val cand = sBanded
      .join(cBanded, Seq("band", "band_hash"))
      .select(col("doc_id"), col("ref_id"), col("__sh"))
    val candEnc = org.apache.spark.sql.Encoders.row(cand.schema)
    cand.repartition(col("doc_id"), col("ref_id"))
      .mapPartitions { rows =>
        val seen = scala.collection.mutable.HashSet.empty[(Any, Any)]
        rows.filter(r => seen.add((r.get(0), r.get(1))))
      }(candEnc)
      .join(cContent, Seq("ref_id"))
      .withColumn("jaccard",
        graft.ops.Dedup.jaccardCol(col("__sh"), col("__sh_ref")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_id"), col("ref_id"), col("jaccard"))
  }

  /** [[screenStream]] with the index built (and persisted) from a raw
    * corpus frame. DEPRECATED: the index persists cache entries this
    * overload exposes no handle to, so they can never be unpersisted —
    * repeated query construction over the same corpus leaks session cache
    * for the session's lifetime. Build a [[ScreenIndex]] with
    * [[screenIndex]], pass it to the primary overload, and
    * `unpersist()` it when the query stops (e.g. from a
    * `StreamingQueryListener.onQueryTerminated`).
    */
  @deprecated("builds a persisted ScreenIndex with no unpersist handle; " +
    "use screenIndex(...).persist() and the primary overload, and " +
    "unpersist() on query termination", "round 16")
  def screenStream(
      stream: DataFrame, idCol: String, textCol: String,
      corpus: DataFrame, refIdCol: String, refTextCol: String,
      threshold: Double = 0.8, numHashes: Int = 128, bands: Int = 16,
      shingleK: Int = 3): DataFrame =
    screenStream(stream, idCol, textCol,
      screenIndex(corpus, refIdCol, refTextCol, numHashes, bands, shingleK)
        .persist(),
      threshold, numHashes, bands, shingleK)

  /** Event input for sessionization. */
  final case class SessionEvent(key: String, tsMicros: Long, value: Double)

  /** Accumulated per-key session state. */
  final case class SessionState(
      startMicros: Long, lastMicros: Long, nEvents: Long, total: Double)

  /** Closed session emitted when a key goes idle past the gap. */
  final case class ClosedSession(
      key: String, startMicros: Long, endMicros: Long, nEvents: Long,
      total: Double, durationMicros: Long)

  /** Stateful sessionization with `flatMapGroupsWithState`: events within
    * `gapMicros` of each other extend a key's session; a newer event past
    * the gap closes and emits the previous session. With `idleTimeoutMs`
    * > 0, a processing-time timeout also closes idle sessions (long-running
    * queries); 0 keeps gap-closure only (bounded drains, e.g. AvailableNow).
    */
  def sessionize(
      events: Dataset[SessionEvent], gapMicros: Long,
      idleTimeoutMs: Long = 0L): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, timeoutConf) {
        (key: String, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val closed = state.getOption.map(s => ClosedSession(
              key, s.startMicros, s.lastMicros, s.nEvents, s.total,
              s.lastMicros - s.startMicros))
            state.remove()
            closed.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.tsMicros)
            var current = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            sorted.foreach { e =>
              current match {
                case Some(s) if e.tsMicros - s.lastMicros <= gapMicros =>
                  current = Some(s.copy(
                    lastMicros = math.max(s.lastMicros, e.tsMicros),
                    nEvents = s.nEvents + 1, total = s.total + e.value))
                case Some(s) =>
                  closed += ClosedSession(key, s.startMicros, s.lastMicros,
                    s.nEvents, s.total, s.lastMicros - s.startMicros)
                  current = Some(SessionState(e.tsMicros, e.tsMicros, 1L, e.value))
                case None =>
                  current = Some(SessionState(e.tsMicros, e.tsMicros, 1L, e.value))
              }
            }
            current.foreach(state.update)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            closed.iterator
          }
      }
  }
}
