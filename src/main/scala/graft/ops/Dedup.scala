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

  // Signature kernels as native codegen'd expressions (SignatureExpressions):
  // same one-pass Signatures functions, minus the ScalaUDF row encoders and
  // the whole-stage-codegen break a UDF forces on its Project.
  import org.apache.spark.sql.graft.ColumnBridge.{column => kcol, expression => kexpr}

  private[graft] def minhashBandKeysCol(text: Column, numHashes: Int,
      bands: Int, shingleK: Int): Column =
    kcol(MinhashBandKeysExpr(kexpr(text), numHashes, bands, shingleK))

  private[graft] def shinglesCol(text: Column, k: Int): Column =
    kcol(WordShinglesExpr(kexpr(text), k))

  private[graft] def jaccardCol(a: Column, b: Column): Column =
    kcol(JaccardExpr(kexpr(a), kexpr(b)))

  /** (id, band, band_hash) rows: one per LSH band per document. Two
    * documents sharing any (band, band_hash) are near-duplicate candidates.
    */
  def minhashBands(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 16, shingleK: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    df.select(col(idCol),
      posexplode(minhashBandKeysCol(col(textCol), numHashes, bands, shingleK))
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
      shinglesCol(col(textCol), shingleK).as("sh"))
    candidates
      .join(content.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(content.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccardCol(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** EXACT n-gram Jaccard pairs above a threshold, without a cross join:
    * candidates come from an inverted shingle index with PREFIX FILTERING
    * (the AllPairs/PPJoin bound): under any global token order, two sets
    * with J(x,y) >= t must share a token within their first
    * |x| - ceil(t*|x|) + 1 tokens, so only those prefixes are indexed.
    * Ordering tokens by ascending document frequency puts stop-shingles at
    * the END of every ordering, so the hot tokens that would explode an
    * unfiltered inverted index almost never land in a prefix. Verification
    * (exact Jaccard over the full shingle sets) touches candidates only.
    *
    * Scale shape: two shuffles (document frequency + the prefix equi-join)
    * over (token, id) pairs, never a cartesian; worst-case degenerates only
    * when many documents are near-identical — in which case the OUTPUT is
    * quadratic and so is any exact algorithm's lower bound.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"ngramJaccardPairs needs a threshold in (0, 1], got $threshold " +
        "(at threshold 0 every pair qualifies and the result itself is " +
        "quadratic; use minhashDuplicatePairs for approximate recall).")
    val withShingles = df.select(col(idCol).as("id"),
      shinglesCol(col(textCol), n).as("sh"))
    val tokens = withShingles
      .select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("shingle"))
    val freq = tokens.groupBy("shingle").agg(count(lit(1)).as("freq"))
    val byRarity = Window.partitionBy("id").orderBy(col("freq"), col("shingle"))
    val prefix = tokens.join(freq, Seq("shingle"))
      .withColumn("pos", row_number().over(byRarity))
      .where(col("pos") <= col("sz") - ceil(col("sz") * threshold) + 1)
      .select("id", "shingle")
    val candidates = prefix.toDF("id_a", "shingle")
      .join(prefix.toDF("id_b", "shingle"), Seq("shingle"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    candidates
      .join(withShingles.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withShingles.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccardCol(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------------------- clustering

  /** Transitive duplicate clusters from a pair list ((id_a, id_b) rows, as
    * produced by the *DuplicatePairs operators): returns (id, cluster_id)
    * where cluster_id is the minimum id reachable through pair edges.
    *
    * Pointer-doubling connected components: large-star / small-star
    * contractions (after the MapReduce CC algorithm of Kiveris et al.,
    * "Connected Components in MapReduce and Beyond"), with both stars
    * applied simultaneously to the same round snapshot so one
    * neighborhood aggregate serves both halves. Unlike one-hop
    * min-label propagation — whose round count is the cluster DIAMETER, a
    * silent correctness hole on the long duplicate chains templated
    * corpora produce at scale — star contraction shrinks every path
    * multiplicatively, so rounds are O(log n) and the default cap covers
    * any physically storable component. If the cap is ever hit anyway the
    * call FAILS LOUDLY instead of returning a partially-merged clustering.
    *
    * Scale shape: one neighborhood aggregate job per round. The
    * neighborhood minimum comes from `groupBy(u).agg(min)` + equi-join —
    * map-side partial aggregation, no per-key sort, and AQE can split a
    * skewed hub across tasks (a `Window.partitionBy(u)` would pin the
    * largest component's hub adjacency, which star contraction
    * deliberately grows, into ONE sorting task). The same aggregate
    * carries the convergence test, so a converged round exits before any
    * contraction work runs. Never the payload, no driver-side graph;
    * lineage is cut with a lazy localCheckpoint every few rounds (it
    * materializes inside the next round's convergence count — no extra
    * blocking job on the round path).
    */
  def clusterDuplicates(
      pairs: DataFrame, maxIterations: Int = 20): DataFrame = {
    // The pair list is usually the OUTPUT of an expensive candidate
    // pipeline (LSH join + verification) and it sits at the BASE of every
    // round's plan: a cache() pins the data but leaves the pipeline's
    // multi-MB logical plan under every round's analysis — QueryProfile
    // measured ~60% of dedup_cluster's wall as driver time BETWEEN jobs,
    // re-analyzing that base each round. An EAGER localCheckpoint
    // materializes the same single pass AND truncates the lineage to a
    // LogicalRDD, so each round (and the node list, consumed only by the
    // final cluster join) plans over O(round) nodes instead of
    // O(candidate pipeline). Blocks are reclaimed by the ContextCleaner
    // when the frame is GC'd.
    val input = pairs.localCheckpoint(true)
    val nodes = input.select(col("id_a").as("id"))
      .unionByName(input.select(col("id_b").as("id")))
      .distinct()
      .cache()
    // Canonical larger->smaller orientation; self-loops dropped.
    val init = input
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

    var edges = init.cache()
    // The previous round's cached frames stay pinned until the CURRENT
    // round's aggregate job has materialized this round's inputs — caches
    // are lazy, and unpersisting a parent before its child materializes
    // silently recomputes the whole lineage chain. (`input` is a local
    // checkpoint, not a cache — its blocks outlive the loop and are
    // reclaimed by the ContextCleaner, so it never enters `retired`.)
    var retired: Seq[DataFrame] = Seq.empty
    var iteration = 0
    var converged = false
    while (iteration < maxIterations && !converged) {
      val undirected = edges
        .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      // One aggregate drives both halves of the round: `mn` is the
      // large-star attachment label, and (mn, mx, deg) decide convergence.
      // Fixpoint = the edges form a star forest, which in undirected
      // neighborhood terms is: every node either sees only larger
      // neighbors (a star center) or exactly one smaller neighbor and
      // nothing else (a leaf). Any chain, multi-parent child, or
      // child-that-is-also-a-parent violates one of the two at some node.
      val hood = undirected.groupBy("u").agg(
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(lit(1)).as("deg")).cache()
      val violations = hood
        .where(!(col("mn") > col("u") ||
          (col("deg") === 1 && col("mx") < col("u"))))
        .limit(1).count() // materializes hood (and this round's edges)
      retired.foreach(_.unpersist())
      retired = Seq.empty
      if (violations == 0) {
        converged = true
        hood.unpersist()
      } else {
        // Both stars are applied simultaneously to the SAME input snapshot,
        // so the one `hood` aggregate serves both halves — no second
        // neighborhood aggregate per round (the old shape re-grouped the
        // large-star output to find the small-star min, one more full
        // shuffle + join every round). Connectivity is preserved per edge:
        // for (u,v) with v>u the large half links v to least(mn_u, u) and
        // the self row links u to mn_u, so u and v stay connected through
        // mn_u (or directly when u has no smaller neighbor); every emitted
        // edge is strictly larger->smaller, keeping the orientation
        // invariant; a star forest maps to itself, so the fixpoint test is
        // unchanged.
        val withMn = undirected.join(hood.select("u", "mn"), "u")
        // Large-star: each node u attaches its strictly LARGER neighbors
        // to the minimum of its neighborhood (including u itself). Small
        // labels leapfrog along chains instead of advancing one hop.
        val largeHalf = withMn.where(col("v") > col("u"))
          .select(col("v").as("u"), least(col("mn"), col("u")).as("v"))
        // Small-star: each node u re-points its (all smaller) neighbors at
        // its neighborhood minimum; mn_u <= v for every smaller neighbor
        // v, and v == mn_u is skipped, so output stays larger->smaller.
        val smallHalf = withMn
          .where(col("v") < col("u") && col("v") =!= col("mn"))
          .select(col("v").as("u"), col("mn").as("v"))
        // Self row (u -> mn_u) for every node with a smaller neighbor,
        // straight off the aggregate.
        val selfRows = hood.where(col("mn") < col("u"))
          .select(col("u"), col("mn").as("v"))
        val dedup = largeHalf.unionByName(smallHalf).unionByName(selfRows)
          .distinct()
        // Each round's plan builds on the last, and the join-based round
        // references its inputs ~12 times — every 2nd round is cut off
        // with a LAZY localCheckpoint so the composed logical plan (and
        // the planner time and heap it costs) stays bounded. Lazy is safe
        // and a full job cheaper than eager: it materializes inside the
        // NEXT round's convergence count, while that round's inputs (this
        // round's caches) are still pinned — `retired` only unpersists
        // after the count returns.
        val next =
          if ((iteration + 1) % 2 == 0) dedup.localCheckpoint(false)
          else dedup.cache()
        retired = Seq(edges, hood)
        edges = next
      }
      iteration += 1
    }
    if (!converged) {
      // The in-loop check runs BEFORE each contraction, so a graph that
      // converges exactly on the final permitted contraction exits the
      // loop unchecked — verify once more before declaring failure.
      val undirected = edges
        .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      converged = undirected.groupBy("u").agg(
          min(col("v")).as("mn"), max(col("v")).as("mx"),
          count(lit(1)).as("deg"))
        .where(!(col("mn") > col("u") ||
          (col("deg") === 1 && col("mx") < col("u"))))
        .limit(1).count() == 0
    }
    if (!converged)
      throw new IllegalStateException(
        s"clusterDuplicates did not converge within $maxIterations " +
          "star-contraction rounds — with pointer-doubling this needs a " +
          "component of ~2^rounds nodes, so the input pair list is almost " +
          "certainly degenerate; raise maxIterations only after checking it.")
    // `nodes` stays cached: the caller consumes the result lazily and the
    // node list derives from the (possibly expensive) pair computation.
    val parents = edges.select(col("u").as("id"), col("v").as("cluster_id"))
    nodes.join(parents, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
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

  /** 62-bit SimHash of the text's word features (one-pass codegen'd kernel). */
  def simhash(text: Column): Column = kcol(SimhashExpr(kexpr(text)))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs within `maxDistance` bits, using 4
    * 16-bit chunks of the 62-bit signature for candidate generation. By
    * pigeonhole the chunk-collision candidates are exhaustive for
    * `maxDistance` <= 3; beyond that the recall is approximate (a pair must
    * still agree on one full chunk), which is the standard SimHash
    * blocking trade-off.
    *
    * Skew hardening (same output, degenerate-corpus-safe plan):
    *  - Blocking runs over DISTINCT signatures, so a corpus where thousands
    *    of documents hash identically (boilerplate, empty pages) blocks
    *    over ONE row instead of quadratically colliding them in a bucket.
    *  - A common 16-bit chunk value among distinct signatures is salted:
    *    the left side is split into `Salts` groups by signature hash and
    *    the right side replicated to every salt, so a hot bucket becomes
    *    `Salts` tasks instead of one straggler.
    *  - Identical-signature groups (distance 0 by construction) expand
    *    into pairs through a blocked self-join — `Blocks*(Blocks+1)/2`
    *    cells per group — because their output is inherently quadratic and
    *    must at least be generated in parallel, never in one task.
    */
  def simhashDuplicatePairs(
      df: DataFrame, idCol: String, textCol: String,
      maxDistance: Int = 3): DataFrame = {
    val Salts = 8L
    val Blocks = 16L
    // The narrow (id, sig) frame feeds four derivations (distinct-sig
    // blocking, both expansion joins, member counts). Deliberately NOT
    // cached: the one-pass signature kernel recomputes at scan speed
    // inside whole-stage codegen, while an InMemoryRelation boundary
    // breaks codegen and costs more than the re-hash (measured 2.9 s ->
    // 3.6 s at sf0.1). Callers scoring a truly enormous corpus can
    // materialize (id, sig) to Parquet themselves and pass that in.
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))

    // Candidate signature pairs from salted chunk blocking over distinct sigs.
    val chunked = sigs.select("sig").distinct().select(col("sig"),
      posexplode(kcol(SimhashChunksExpr(kexpr(col("sig")))))
        .as(Seq("chunk", "chunk_val")))
    val aSide = chunked.toDF("sig_a", "chunk", "chunk_val")
      .withColumn("salt", pmod(xxhash64(col("sig_a")), lit(Salts)))
    val bSide = chunked.toDF("sig_b", "chunk", "chunk_val")
      .withColumn("salt", explode(sequence(lit(0L), lit(Salts - 1L))))
    val sigPairs = aSide.join(bSide, Seq("chunk", "chunk_val", "salt"))
      .where(col("sig_a") < col("sig_b"))
      .select("sig_a", "sig_b").distinct()
      .withColumn("distance", hamming(col("sig_a"), col("sig_b")).cast("int"))
      .where(col("distance") <= maxDistance)

    // Cross-signature pairs: each qualifying signature pair expands to its
    // member documents (1:1 per output row, no further dedup needed).
    val crossPairs = sigPairs
      .join(sigs.select(col("sig").as("sig_a"), col("id").as("raw_a")), Seq("sig_a"))
      .join(sigs.select(col("sig").as("sig_b"), col("id").as("raw_b")), Seq("sig_b"))
      .select(least(col("raw_a"), col("raw_b")).as("id_a"),
        greatest(col("raw_a"), col("raw_b")).as("id_b"), col("distance"))

    // Intra-signature pairs (distance 0): blocked pair enumeration. Member
    // x in block bx meets member y in block by within cell (min(bx,by),
    // max(bx,by)); a pair in two different blocks lands in exactly one
    // cell, same-block pairs are halved by the id comparison.
    val members = sigs
      .join(sigs.groupBy("sig").agg(count(lit(1)).as("cnt")).where(col("cnt") > 1),
        Seq("sig"))
      .select(col("sig"), col("id"), pmod(xxhash64(col("id")), lit(Blocks)).as("blk"))
    val aIntra = members.select(col("sig"), col("id").as("raw_a"), col("blk").as("blk_a"))
      .withColumn("blk_b", explode(sequence(col("blk_a"), lit(Blocks - 1L))))
    val bIntra = members.select(col("sig"), col("id").as("raw_b"), col("blk").as("blk_b"))
    val intraPairs = aIntra.join(bIntra, Seq("sig", "blk_b"))
      .where(col("blk_a") < col("blk_b") || col("raw_a") < col("raw_b"))
      .select(least(col("raw_a"), col("raw_b")).as("id_a"),
        greatest(col("raw_a"), col("raw_b")).as("id_b"),
        lit(0).cast("int").as("distance"))

    crossPairs.unionByName(intraPairs)
  }

  // ------------------------------------------------- embedding near-dup LSH

  /** Exact cosine similarity between two float-array columns.
    *
    * f64 products folded left in array order: a SQL engine replaying the
    * same fold (list_reduce over cast-to-double elements) reproduces the
    * result bit-for-bit, which keeps floor-scaled cosines oracle-checkable.
    * Backed by the codegen'd single-pass CosineSimilarity expression —
    * bit-identical to the higher-order
    * `aggregate(zip_with(...))/sqrt(aggregate(transform(...)))`
    * formulation (spec-pinned), minus its three intermediate arrays and
    * CodegenFallback interpretation.
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Embedding near-duplicate pairs: candidates from shared hyperplane-LSH
    * band buckets, verified with exact cosine.
    */
  def embeddingDuplicatePairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 16, bands: Int = 4): DataFrame = {
    val banded = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      posexplode(kcol(HyperplaneBandKeysExpr(kexpr(col(vecCol)), bits, bands)))
        .as(Seq("band", "band_key")))
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

  /** Semantic dedup by clustering (SemDeDup, Abbas et al. 2023): embed →
    * cluster → keep one exemplar per dense semantic neighborhood. Each row
    * is assigned to its nearest centroid cell
    * ([[Similarity.assignCells]]); within a cell, the lowest-id row is the
    * REPRESENTATIVE, and every other row whose cosine to it exceeds
    * `threshold` is flagged a semantic duplicate. The pairwise in-cluster
    * comparison of the paper collapses to one cosine per row against the
    * exemplar — O(n·nCells + n) instead of O(Σ cell²), with candidate
    * vectors never shuffled against each other: the nCells representative
    * vectors broadcast.
    *
    * Returns per-row decisions: (id, cell, rep_id, cos_rep, is_dup). At
    * scale, `df.where(!is_dup)` is the cleaned corpus.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, threshold: Double = 0.9): DataFrame = {
    val centroids = Similarity.sampleCentroids(df, idCol, vecCol, nCells)
    val assigned = Similarity.assignCells(df, centroids, idCol, vecCol)
      .select(col(idCol).as("id"), col(vecCol).as("__vec"), col("cell"))
    // Representatives: min id per cell (a narrow (cell, id) aggregate),
    // then their vectors fetched by a broadcast join — never a window
    // over the full vector-carrying frame. Renamed projections keep the
    // self-join lineage unambiguous.
    val repIds = assigned.groupBy("cell").agg(min(col("id")).as("rep_id"))
      .toDF("__rcell", "rep_id")
    val reps = assigned.toDF("__rid", "__rep_vec", "__vcell")
      .join(broadcast(repIds), col("__rid") === col("rep_id"))
      .select(col("__rcell"), col("rep_id"), col("__rep_vec"))
    assigned.join(broadcast(reps), col("cell") === col("__rcell"))
      .withColumn("cos_rep", cosine(col("__vec"), col("__rep_vec")))
      .select(col("id"), col("cell"), col("rep_id"), col("cos_rep"),
        (col("id") =!= col("rep_id") && col("cos_rep") > threshold)
          .as("is_dup"))
  }
}
