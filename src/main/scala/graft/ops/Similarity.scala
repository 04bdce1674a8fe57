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

  /** IVF top-k: probe the `nProbe` cells nearest each query, then exact
    * top-k within the probed fraction of the corpus.
    */
  def ivfTopK(
      assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"))
    val qCells = q.crossJoin(broadcast(centroids))
      .withColumn("cos_c", cosine(col("__qv"), col("cvec")))
    val wq = Window.partitionBy("query_id").orderBy(col("cos_c").desc, col("cell"))
    val probes = qCells.withColumn("__r", row_number().over(wq))
      .where(col("__r") <= nProbe)
      .select("query_id", "__qv", "cell")

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
