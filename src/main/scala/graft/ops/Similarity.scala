package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - brute-force: broadcast the (small) query set against the corpus; one
  *    narrow pass computes cosines, a per-query top-k window finishes. The
  *    corpus is never shuffled — this is the exact baseline and scales
  *    linearly with corpus size x queries.
  *  - IVF: corpus pre-assigned to centroid cells; a query probes only the
  *    nearest `nProbe` cells, reading a fraction of the corpus. Centroids
  *    are sampled deterministically and broadcast.
  */
object Similarity {

  import Dedup.cosine

  /** Exact top-k cosine neighbors for each query row.
    *
    * @param corpus  (idCol, vecCol) rows
    * @param queries (queryIdCol, vecCol) rows — must be small enough to
    *                broadcast (the usual case: a probe batch)
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Deterministically sample `nCells` centroid vectors: the rows whose
    * Knuth-multiplicative-hashed id sorts first (a cheap, reproducible
    * stand-in for k-means; the hash is plain integer arithmetic so external
    * engines can reproduce the selection).
    */
  def sampleCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int): DataFrame =
    corpus
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      .orderBy(
        pmod(col("cid").cast("long") * lit(2654435761L), lit(2147483648L)),
        col("cid"))
      .limit(nCells)
      // The frame is <= nCells rows in one partition after the global limit.
      // Partitioning the window by spark_partition_id() (constant 0 here,
      // but not foldable, so EliminateWindowPartitions keeps it) encodes
      // that intent without Spark's unpartitioned-window warning.
      .withColumn("cell",
        row_number().over(
          Window.partitionBy(spark_partition_id()).orderBy(col("cid"))) - 1)
      .select("cell", "cvec")

  /** Assign every corpus row to its nearest centroid cell. The centroid set
    * is broadcast; assignment is a narrow pass. At scale the result is
    * written bucketed by `cell` so probes read only matching buckets.
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .withColumn("cos_c", cosine(col(vecCol), col("cvec")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("cos_c").desc, col("cell"))
    scored.withColumn("__r", row_number().over(w)).where(col("__r") === 1)
      .drop("__r", "cos_c", "cvec")
  }

  /** Persist an IVF index: the assigned corpus written as Parquet
    * partitioned by cell. At scale a probe then reads ONLY the matching
    * cell directories (partition pruning) — the on-disk analog of an IVF
    * inverted list.
    */
  def writeIvfIndex(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Top-k against a persisted IVF index. The probed cell ids (at most
    * nCells values — index metadata, not data) are collected and pushed as
    * a static `cell IN (...)` partition filter, so only matching cell
    * directories are listed and read regardless of DPP heuristics.
    */
  def probeIvfIndex(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      centroids: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val probes = probeCells(centroids, queries, vecCol, queryIdCol, nProbe)
    val cells = probes.select("cell").distinct().collect().map(_.getInt(0))
    val pruned = spark.read.parquet(indexPath)
      .where(col("cell").isin(cells.toIndexedSeq.map(c => c: Any): _*))
    inCellTopK(pruned, probes, idCol, vecCol, k)
  }

  /** IVF top-k: probe the `nProbe` cells nearest each query, then exact
    * top-k within the probed fraction of the corpus.
    */
  def ivfTopK(
      assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      k: Int, nProbe: Int): DataFrame =
    inCellTopK(assigned,
      probeCells(centroids, queries, vecCol, queryIdCol, nProbe), idCol, vecCol, k)

  /** LSH-bucketed approximate top-k for LARGE query sets: both sides get
    * hyperplane band keys, candidates come from a plain equi-join on
    * (band, key) — a shuffle join that scales when the query set is too big
    * to broadcast (bruteForceTopK) and too scattered for per-cell probing
    * (ivfTopK). Recall follows the LSH collision probability; every vector
    * collides with itself in all bands, so self-matches always surface.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      k: Int, bits: Int = 8, bands: Int = 16): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    def bandKeys(vec: Column): Column =
      ColumnBridge.column(
        HyperplaneBandKeysExpr(ColumnBridge.expression(vec), bits, bands))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      posexplode(bandKeys(col(vecCol))).as(Seq("band", "band_key")))
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"),
      posexplode(bandKeys(col(vecCol))).as(Seq("band", "band_key")))
    val candidates = c.join(q, Seq("band", "band_key"))
      .select("query_id", "__qv", "neighbor_id", "__cv")
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    candidates
      .withColumn("cos", cosine(col("__cv"), col("__qv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  // ------------------------------------------------ product quantization

  /** Deterministic PQ codebook: the `nCodes` vectors whose
    * Knuth-multiplicative-hashed id sorts first (same reproducible sample
    * rule as [[sampleCentroids]]; bounded collect — index metadata, not
    * data). Codeword `j`'s subspace `mm` is this vector's slice
    * `[mm*sub, (mm+1)*sub)`.
    */
  def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      nCodes: Int = 256): Array[Array[Float]] =
    corpus
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      .orderBy(
        pmod(col("cid").cast("long") * lit(2654435761L), lit(2147483648L)),
        col("cid"))
      .limit(nCodes)
      .collect().map(_.getSeq[Float](1).toArray)

  /** Encode the corpus into the PQ scoring index: `(id, code, norm)` —
    * one packed long of per-subspace codeword indices plus the exact f64
    * vector norm. 64-dim float vectors (256 B) become 16 B rows: the
    * index for a corpus whose raw vectors span TBs fits executor memory,
    * and scoring it never re-reads the vectors. A narrow codegen'd scan;
    * no shuffle.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: Array[Array[Float]], m: Int = 8): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    corpus.select(col(idCol).as("id"),
      ColumnBridge.column(
        PqEncodeExpr(ColumnBridge.expression(col(vecCol)), codebook, m))
        .as("code"),
      ColumnBridge.column(VecNormExpr(ColumnBridge.expression(col(vecCol))))
        .as("norm"))
  }

  /** Approximate top-k over the PQ index by asymmetric distance
    * computation: each query precomputes one lookup table of
    * subvector-to-codeword dot products (m * |codebook| doubles, built
    * once per query and broadcast with it), so scoring a code is `m`
    * array lookups — the scan does no vector arithmetic at all. Scores
    * are approximate cosines: ADC dot / (query norm * exact stored
    * corpus norm).
    */
  def pqTopK(encoded: DataFrame, codebook: Array[Array[Float]],
      queries: DataFrame, queryIdCol: String, vecCol: String,
      k: Int, m: Int = 8): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val q = queries.select(col(queryIdCol).as("query_id"),
      ColumnBridge.column(
        PqLutExpr(ColumnBridge.expression(col(vecCol)), codebook, m))
        .as("__lut"),
      ColumnBridge.column(VecNormExpr(ColumnBridge.expression(col(vecCol))))
        .as("__qn"))
    val denom = col("norm") * col("__qn")
    val scored = encoded.crossJoin(broadcast(q))
      .withColumn("score",
        // A zero vector has no direction: score 0, and never a division
        // (ANSI mode would throw where IEEE returns NaN).
        when(denom =!= 0d,
          ColumnBridge.column(PqAdcExpr(
            ColumnBridge.expression(col("code")),
            ColumnBridge.expression(col("__lut")), codebook.length)) / denom)
          .otherwise(0d))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("score"), col("rank"))
  }

  /** IVF+PQ: the at-scale composition — queries probe only the `nProbe`
    * nearest centroid cells (reading a fraction of the corpus) and score
    * the probed rows by ADC over the packed PQ codes (16x smaller rows,
    * no vector arithmetic). `assignedCodes` is the corpus with `cell`
    * (from [[assignCells]]) plus `code`/`norm` (from [[pqEncode]]) — at
    * scale, written partitioned by cell so probes prune directories.
    */
  def ivfPqTopK(assignedCodes: DataFrame, centroids: DataFrame,
      codebook: Array[Array[Float]], queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      k: Int, nProbe: Int, m: Int = 8): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val probes = probeCells(centroids, queries, vecCol, queryIdCol, nProbe)
      .select(col("query_id"), col("cell"),
        ColumnBridge.column(
          PqLutExpr(ColumnBridge.expression(col("__qv")), codebook, m))
          .as("__lut"),
        ColumnBridge.column(VecNormExpr(ColumnBridge.expression(col("__qv"))))
          .as("__qn"))
    val denom = col("norm") * col("__qn")
    val scored = assignedCodes
      .select(col(idCol).as("neighbor_id"), col("cell"),
        col("code"), col("norm"))
      .join(broadcast(probes), Seq("cell"))
      .withColumn("score",
        when(denom =!= 0d,
          ColumnBridge.column(PqAdcExpr(
            ColumnBridge.expression(col("code")),
            ColumnBridge.expression(col("__lut")), codebook.length)) / denom)
          .otherwise(0d))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** The nProbe centroid cells nearest each query: (query_id, __qv, cell). */
  private def probeCells(
      centroids: DataFrame, queries: DataFrame,
      vecCol: String, queryIdCol: String, nProbe: Int): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"))
    val qCells = q.crossJoin(broadcast(centroids))
      .withColumn("cos_c", cosine(col("__qv"), col("cvec")))
    val wq = Window.partitionBy("query_id").orderBy(col("cos_c").desc, col("cell"))
    qCells.withColumn("__r", row_number().over(wq))
      .where(col("__r") <= nProbe)
      .select("query_id", "__qv", "cell")
  }

  /** Exact per-query top-k over the probed cells of the corpus. */
  private def inCellTopK(
      assigned: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val scored = assigned
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col("cell"))
      .join(broadcast(probes), Seq("cell"))
      .withColumn("cos", cosine(col("__cv"), col("__qv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }
}
