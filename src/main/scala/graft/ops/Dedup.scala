package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora. Scale shapes:
  *
  *  - exact: one hash-keyed shuffle of (hash, id) — never the payload.
  *  - MinHash/SimHash LSH: signatures are one-pass kernels in a narrow
  *    stage; only (band-key, id) pairs shuffle, and candidate verification
  *    joins the payload back per bucket. Bucket skew is bounded by band
  *    width; raising `bands`/`bits` splits hot buckets.
  *  - embedding near-dup: random-hyperplane LSH over the vectors, exact
  *    cosine verification on candidates only.
  */
object Dedup {

  // ------------------------------------------------------------------ exact

  /** Exact duplicate groups keyed by md5 of the payload columns: one row per
    * distinct content with the kept (minimum) id and the duplicate count.
    */
  def exactGroups(df: DataFrame, idCol: String, payloadCols: Seq[String]): DataFrame =
    df.groupBy(md5(concat_ws(" ", payloadCols.map(col): _*)).as("content_hash"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("dup_count"))

  /** Drop exact duplicates, keeping the lowest id per content group. */
  def dropExactDuplicates(df: DataFrame, idCol: String, payloadCols: Seq[String]): DataFrame = {
    val h = md5(concat_ws(" ", payloadCols.map(col): _*))
    val w = Window.partitionBy(h).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  // ---------------------------------------------------------------- minhash

  private def bandKeysUdf(numHashes: Int, bands: Int, shingleK: Int) =
    udf { text: String =>
      Signatures.minhashBandKeys(
        Signatures.minhash(text, numHashes, shingleK), bands)
    }

  private val shinglesUdf =
    udf { (text: String, k: Int) => Signatures.wordShingles(text, k) }

  private val jaccardUdf =
    udf { (a: Seq[String], b: Seq[String]) =>
      Signatures.jaccard(a.toArray, b.toArray)
    }

  /** (id, band, band_hash) rows: one per LSH band per document. Two
    * documents sharing any (band, band_hash) are near-duplicate candidates.
    */
  def minhashBands(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 16, shingleK: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    df.select(col(idCol),
      posexplode(bandKeysUdf(numHashes, bands, shingleK)(col(textCol)))
        .as(Seq("band", "band_hash")))
  }

  /** Candidate pairs from shared LSH buckets, verified with exact shingle
    * Jaccard; pairs below `threshold` are dropped.
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashDuplicatePairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 128, bands: Int = 16,
      shingleK: Int = 3): DataFrame = {
    val banded = minhashBands(df, idCol, textCol, numHashes, bands, shingleK)
    val a = banded.toDF("id_a", "band", "band_hash")
    val b = banded.toDF("id_b", "band", "band_hash")
    val candidates = a.join(b, Seq("band", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    val content = df.select(col(idCol).as("id"),
      shinglesUdf(col(textCol), lit(shingleK)).as("sh"))
    candidates
      .join(content.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(content.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccardUdf(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard similarity for all pairs above a threshold —
    * the non-approximate (quadratic) reference path; use the LSH variant at
    * scale. Broadcast-friendly only for small candidate sets.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val withShingles = df.select(col(idCol).as("id"),
      shinglesUdf(col(textCol), lit(n)).as("sh"))
    val a = withShingles.toDF("id_a", "sh_a")
    val b = withShingles.toDF("id_b", "sh_b")
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccardUdf(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------------------- clustering

  /** Transitive duplicate clusters from a pair list ((id_a, id_b) rows, as
    * produced by the *DuplicatePairs operators): returns (id, cluster_id)
    * where cluster_id is the minimum id reachable through pair edges.
    * Distributed label propagation — per iteration one join + one min
    * aggregation, no driver-side graph; near-dup clusters are short chains,
    * so convergence is fast (iterations bounded by cluster diameter).
    */
  def clusterDuplicates(
      pairs: DataFrame, maxIterations: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
    var iteration = 0
    var converged = false
    while (iteration < maxIterations && !converged) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("cluster_id", "dst_cluster"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_cluster")).as("neighbor_min"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("neighbor_min"), col("cluster_id")))
            .as("cluster_id"))
        .cache()
      updated.count() // materialize before comparing
      val changed = updated.as("u")
        .join(labels.as("l"), col("u.id") === col("l.id"))
        .where(col("u.cluster_id") =!= col("l.cluster_id"))
        .limit(1).count() > 0
      labels.unpersist()
      labels = updated
      converged = !changed
      iteration += 1
    }
    edges.unpersist()
    labels
  }

  /** Drop near-duplicates: keep one representative (the minimum id) per
    * transitive cluster of `pairs`, plus every row in no cluster.
    */
  def dropNearDuplicates(
      df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = clusterDuplicates(pairs)
      .where(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  // ---------------------------------------------------------------- simhash

  /** 62-bit SimHash of the text's word features (one-pass kernel). */
  val simhash = udf { text: String => Signatures.simhash(text) }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs within `maxDistance` bits, using 4
    * 16-bit chunks of the 62-bit signature for candidate generation. By
    * pigeonhole the chunk-collision candidates are exhaustive for
    * `maxDistance` <= 3; beyond that the recall is approximate (a pair must
    * still agree on one full chunk), which is the standard SimHash
    * blocking trade-off.
    */
  def simhashDuplicatePairs(
      df: DataFrame, idCol: String, textCol: String,
      maxDistance: Int = 3): DataFrame = {
    val chunksUdf = udf { sig: Long =>
      Array.tabulate(4)(c => (sig >>> (c * 16)) & 0xffffL)
    }
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val chunked = sigs.select(col("id"), col("sig"),
      posexplode(chunksUdf(col("sig"))).as(Seq("chunk", "chunk_val")))
    val a = chunked.toDF("id_a", "sig_a", "chunk", "chunk_val")
    val b = chunked.toDF("id_b", "sig_b", "chunk", "chunk_val")
    a.join(b, Seq("chunk", "chunk_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("sig_a"), col("sig_b")).as("distance"))
      .distinct()
      .where(col("distance") <= maxDistance)
  }

  // ------------------------------------------------- embedding near-dup LSH

  /** Exact cosine similarity between two float-array columns (expression:
    * single pass over attribute references, codegen-friendly).
    */
  def cosine(a: Column, b: Column): Column = {
    // f64 products folded left in array order: a SQL engine replaying the
    // same fold (list_reduce over cast-to-double elements) reproduces the
    // result bit-for-bit, which keeps floor-scaled cosines oracle-checkable.
    val dot = aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0d), (acc, x) => acc + x))
    val nb = sqrt(aggregate(
      transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0d), (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** Embedding near-duplicate pairs: candidates from shared hyperplane-LSH
    * band buckets, verified with exact cosine.
    */
  def embeddingDuplicatePairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 16, bands: Int = 4): DataFrame = {
    val bandsUdf = udf { vec: Seq[Float] =>
      Signatures.hyperplaneBandKeys(vec.toArray, bits, bands)
    }
    val banded = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      posexplode(bandsUdf(col(vecCol))).as(Seq("band", "band_key")))
    val a = banded.toDF("id_a", "vec_a", "band", "band_key")
    val b = banded.toDF("id_b", "vec_b", "band", "band_key")
    a.join(b, Seq("band", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("vec_a"), col("vec_b"))
      .distinct()
      .withColumn("cosine", cosine(col("vec_a"), col("vec_b")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
