package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import QueryUtil._

/** The training-data-pipeline surface: dedup (exact / MinHash-LSH / SimHash /
  * n-gram Jaccard / embedding-cosine), similarity search (brute-force +
  * IVF), text analysis, and the multimodal stub pipeline — each a checked
  * query over the documents/embeddings tables. SQL-reproducible operators
  * carry DuckDB oracles; LSH/hash-seeded ones are checked by their exact
  * counterparts and the ScalaTest suite.
  */
object PipelineQueries {

  val queries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    ("dedup_exact", (s: SparkSession, d: String) => {
      Dedup.exactGroups(table(s, d, "documents"), "doc_id", Seq("text"))
        .orderBy("content_hash")
    }, Some("""
      SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        count(*) AS dup_count
      FROM documents GROUP BY 1 ORDER BY 1""")),

    // Exact word-level Jaccard pairs (quadratic verification path); capped
    // to the first 200 docs so the bench stays bounded at larger SFs.
    ("dedup_ngram_jaccard", (s: SparkSession, d: String) => {
      val docs = table(s, d, "documents").where(col("doc_id") < 200)
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 1, threshold = 0.62)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }, Some("""
      WITH sh AS (
        SELECT doc_id,
          list_distinct(list_filter(
            string_split_regex(lower(trim(text)), '\s+'), w -> w <> '')) AS words
        FROM documents WHERE doc_id < 200)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        round(CAST(len(list_intersect(a.words, b.words)) AS DOUBLE) /
          len(list_distinct(list_concat(a.words, b.words))), 4) AS jaccard
      FROM sh a, sh b
      WHERE a.doc_id < b.doc_id
        AND CAST(len(list_intersect(a.words, b.words)) AS DOUBLE) /
          len(list_distinct(list_concat(a.words, b.words))) >= 0.62
      ORDER BY id_a, id_b""")),

    // MinHash LSH near-dup pairs: polynomial shingle hashes + two-hash-trick
    // permutations are plain integer arithmetic, so the oracle replays the
    // exact signatures, band buckets, and Jaccard verification.
    ("dedup_minhash_lsh", (s: SparkSession, d: String) => {
      Dedup.minhashDuplicatePairs(
          table(s, d, "documents"), "doc_id", "text",
          threshold = 0.7, numHashes = 128, bands = 16, shingleK = 2)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }, Some("""
      WITH docs AS (
        SELECT doc_id, list_filter(
          string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        FROM documents),
      sh AS (
        SELECT doc_id, unnest(list_distinct(
          list_transform(range(1, greatest(len(ws), 1)),
            i -> ws[i] || ' ' || ws[i + 1]))) AS shingle
        FROM docs WHERE len(ws) >= 2),
      hh AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(7 AS BIGINT),
            list_transform(string_split(shingle, ''),
              c -> CAST(unicode(c) AS BIGINT))),
            (acc, c) -> (acc * 131 + c) % 2147483647) AS h1,
          list_reduce(list_prepend(CAST(13 AS BIGINT),
            list_transform(string_split(shingle, ''),
              c -> CAST(unicode(c) AS BIGINT))),
            (acc, c) -> (acc * 131 + c) % 2147483647) AS h2
        FROM sh),
      sig AS (
        SELECT doc_id, i.i AS i, min((h1 + i.i * h2) % 2147483647) AS v
        FROM hh, (SELECT unnest(range(128)) AS i) i
        GROUP BY doc_id, i.i),
      bands AS (
        SELECT doc_id, i // 8 AS band,
          string_agg(v, ',' ORDER BY i) AS band_key
        FROM sig GROUP BY doc_id, i // 8),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id),
      shs AS (
        SELECT doc_id, list_distinct(
          list_transform(range(1, greatest(len(ws), 1)),
            i -> ws[i] || ' ' || ws[i + 1])) AS sset
        FROM docs),
      verified AS (
        SELECT c.id_a, c.id_b,
          CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
            (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset)))
            AS j
        FROM cand c
        JOIN shs a ON a.doc_id = c.id_a
        JOIN shs b ON b.doc_id = c.id_b)
      SELECT id_a, id_b, round(j, 4) AS jaccard
      FROM verified WHERE j >= 0.7
      ORDER BY id_a, id_b""")),

    // Transitive duplicate clusters over the MinHash pairs: the oracle
    // replays the pair construction and resolves connected components with
    // a recursive closure, checking the distributed label propagation
    // end to end (every member labeled with its component's minimum id).
    ("dedup_cluster", (s: SparkSession, d: String) => {
      val pairs = Dedup.minhashDuplicatePairs(
        table(s, d, "documents"), "doc_id", "text",
        threshold = 0.7, numHashes = 128, bands = 16, shingleK = 2)
      Dedup.clusterDuplicates(pairs).orderBy("id")
    }, Some("""
      WITH RECURSIVE docs AS (
        SELECT doc_id, list_filter(
          string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        FROM documents),
      sh AS (
        SELECT doc_id, unnest(list_distinct(
          list_transform(range(1, greatest(len(ws), 1)),
            i -> ws[i] || ' ' || ws[i + 1]))) AS shingle
        FROM docs WHERE len(ws) >= 2),
      hh AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(7 AS BIGINT),
            list_transform(string_split(shingle, ''),
              c -> CAST(unicode(c) AS BIGINT))),
            (acc, c) -> (acc * 131 + c) % 2147483647) AS h1,
          list_reduce(list_prepend(CAST(13 AS BIGINT),
            list_transform(string_split(shingle, ''),
              c -> CAST(unicode(c) AS BIGINT))),
            (acc, c) -> (acc * 131 + c) % 2147483647) AS h2
        FROM sh),
      sig AS (
        SELECT doc_id, i.i AS i, min((h1 + i.i * h2) % 2147483647) AS v
        FROM hh, (SELECT unnest(range(128)) AS i) i
        GROUP BY doc_id, i.i),
      bands AS (
        SELECT doc_id, i // 8 AS band,
          string_agg(v, ',' ORDER BY i) AS band_key
        FROM sig GROUP BY doc_id, i // 8),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id),
      shs AS (
        SELECT doc_id, list_distinct(
          list_transform(range(1, greatest(len(ws), 1)),
            i -> ws[i] || ' ' || ws[i + 1])) AS sset
        FROM docs),
      pairs AS (
        SELECT c.id_a, c.id_b FROM cand c
        JOIN shs a ON a.doc_id = c.id_a
        JOIN shs b ON b.doc_id = c.id_b
        WHERE CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
          (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset)))
          >= 0.7),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
      SELECT src AS id, least(src, min(dst)) AS cluster_id
      FROM reach GROUP BY src ORDER BY id""")),

    // SimHash pairs: the polynomial word hashes are plain integer
    // arithmetic, so the full pipeline — 62-bit signatures, 16-bit chunk
    // blocking, Hamming filter — is replicated by the oracle exactly.
    ("dedup_simhash", (s: SparkSession, d: String) => {
      Dedup.simhashDuplicatePairs(
          table(s, d, "documents"), "doc_id", "text", maxDistance = 12)
        .orderBy("id_a", "id_b")
    }, Some("""
      WITH w AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS word
        FROM documents),
      h AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(7 AS BIGINT),
            list_transform(string_split(word, ''), c -> CAST(unicode(c) AS BIGINT))),
            (acc, c) -> (acc * 131 + c) % 2147483647)
          | (list_reduce(list_prepend(CAST(13 AS BIGINT),
            list_transform(string_split(word, ''), c -> CAST(unicode(c) AS BIGINT))),
            (acc, c) -> (acc * 131 + c) % 2147483647) << 31) AS wh
        FROM w),
      votes AS (
        SELECT doc_id, b.b AS bit,
          sum(CASE WHEN (wh >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM h, (SELECT unnest(range(62)) AS b) b
        GROUP BY doc_id, b.b),
      sigs AS (
        SELECT doc_id, CAST(sum(
          CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS sig
        FROM votes GROUP BY doc_id),
      chunked AS (
        SELECT doc_id, sig, c.c AS chunk, (sig >> (c.c * 16)) & 65535 AS chunk_val
        FROM sigs, (SELECT unnest(range(4)) AS c) c),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
          a.sig AS sig_a, b.sig AS sig_b
        FROM chunked a JOIN chunked b
          ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val
            AND a.doc_id < b.doc_id)
      SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS distance
      FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 12
      ORDER BY id_a, id_b""")),

    // Hyperplane-LSH near-dup pairs: quadratic-residue plane weights and
    // left-fold f64 dot products are reproduced verbatim by the oracle, so
    // the approximate candidate set AND the verified cosines hash-match.
    // (Embeddings are uniform random — near-1 cosines don't exist, so the
    // threshold exercises verification rather than returning nothing.)
    ("dedup_embedding_lsh", (s: SparkSession, d: String) => {
      Dedup.embeddingDuplicatePairs(
          table(s, d, "embeddings"), "vec_id", "embedding",
          threshold = 0.2, bits = 16, bands = 8)
        .select(col("id_a"), col("id_b"),
          (floor(col("cosine") * 10000d) / 10000d).as("cosine"))
        .orderBy("id_a", "id_b")
    }, Some("""
      WITH bits AS (
        SELECT vec_id, b.b AS bit,
          (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(1, len(embedding) + 1),
              j -> CAST(embedding[j] AS DOUBLE) *
                (CAST((((b.b * 73856093 + (j - 1) * 19349663 + 83492791)
                   % 2147483647)
                   * ((b.b * 73856093 + (j - 1) * 19349663 + 83492791)
                   % 2147483647))
                   % 2147483647 AS DOUBLE) / 2147483647.0 - 0.5))),
            (acc, x) -> acc + x) >= 0) AS bit_set
        FROM embeddings, (SELECT unnest(range(128)) AS b) b),
      bands AS (
        SELECT vec_id, bit // 16 AS band,
          CAST(sum(CASE WHEN bit_set
            THEN (CAST(1 AS BIGINT) << (bit % 16)) ELSE 0 END)
            AS BIGINT) AS band_key
        FROM bits GROUP BY vec_id, bit // 16),
      cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
            AND a.vec_id < b.vec_id),
      pairs AS (
        SELECT c.id_a, c.id_b, ea.embedding AS va, eb.embedding AS vb
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.id_a
        JOIN embeddings eb ON eb.vec_id = c.id_b),
      scored AS (
        SELECT id_a, id_b,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(1, len(va) + 1),
              j -> CAST(va[j] AS DOUBLE) * CAST(vb[j] AS DOUBLE))),
            (acc, x) -> acc + x) /
          (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(1, len(va) + 1),
              j -> CAST(va[j] AS DOUBLE) * CAST(va[j] AS DOUBLE))),
            (acc, x) -> acc + x)) *
           sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(1, len(vb) + 1),
              j -> CAST(vb[j] AS DOUBLE) * CAST(vb[j] AS DOUBLE))),
            (acc, x) -> acc + x))) AS cos
        FROM pairs)
      SELECT id_a, id_b, floor(cos * 10000) / 10000 AS cosine
      FROM scored WHERE cos >= 0.2
      ORDER BY id_a, id_b""")),

    // Exact top-k cosine neighbors; ranks only (cosine stays engine-side so
    // the comparison is robust to last-ulp float differences).
    ("ann_brute_topk", (s: SparkSession, d: String) => {
      val embeddings = table(s, d, "embeddings")
      val queries = embeddings.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.bruteForceTopK(embeddings, queries,
          "vec_id", "embedding", "query_id", k = 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }, Some("""
      WITH s AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          row_number() OVER (PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
              c.vec_id) AS rank
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 10)
      SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
      FROM s WHERE rank <= 5
      ORDER BY query_id, rank""")),

    // IVF-bucketed ANN: deterministic centroid sampling (multiplicative-hash
    // order) makes the whole pipeline — assignment, probing, in-cell top-k —
    // reproducible in SQL, so the approximate result itself is oracled.
    // SemDeDup (Abbas et al. 2023): nearest-centroid clustering, then one
    // exemplar (lowest id) per cell — every other row whose cosine to the
    // exemplar clears the threshold is a semantic duplicate. The oracle
    // replays the WHOLE pipeline (hash-sampled centroids, argmax cell
    // assignment, exemplar choice, f64 cosine, threshold) in DuckDB, so
    // per-row decisions are hash-checked end to end.
    ("dedup_semantic", (s: SparkSession, d: String) => {
      Dedup.semanticDedup(table(s, d, "embeddings"), "vec_id", "embedding",
          nCells = 16, threshold = 0.2)
        .select(col("id").as("vec_id"), col("cell"), col("rep_id"),
          (floor(col("cos_rep") * 10000d) / 10000d).as("cos_rep"),
          col("is_dup"))
        .orderBy("vec_id")
    }, Some("""
      WITH cent AS (
        SELECT row_number() OVER (ORDER BY cid) - 1 AS cell, cvec FROM (
          SELECT vec_id AS cid, embedding AS cvec FROM embeddings
          ORDER BY (vec_id * 2654435761) % 2147483648, vec_id
          LIMIT 16)),
      assigned AS (
        SELECT vec_id, embedding, cell FROM (
          SELECT e.vec_id, e.embedding, c.cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC,
                c.cell) AS rr
          FROM embeddings e, cent c)
        WHERE rr = 1),
      reps AS (SELECT cell, min(vec_id) AS rep_id FROM assigned GROUP BY 1),
      repv AS (
        SELECT r.cell, r.rep_id, a.embedding AS rep_vec
        FROM reps r JOIN assigned a ON a.vec_id = r.rep_id),
      -- The VALUE cosine replays the Spark kernel's exact f64 arithmetic
      -- (sequential index-order folds, dot / (sqrt(na) * sqrt(nb)));
      -- DuckDB's own list_cosine_similarity computes in f32 and drifts in
      -- the low bits.
      j AS (
        SELECT a.vec_id, v.cell, v.rep_id,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(1, len(a.embedding) + 1),
              t -> CAST(a.embedding[t] AS DOUBLE)
                * CAST(v.rep_vec[t] AS DOUBLE))), (acc, x) -> acc + x)
          / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(range(1, len(a.embedding) + 1),
                t -> CAST(a.embedding[t] AS DOUBLE)
                  * CAST(a.embedding[t] AS DOUBLE))), (acc, x) -> acc + x))
            * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(range(1, len(v.rep_vec) + 1),
                t -> CAST(v.rep_vec[t] AS DOUBLE)
                  * CAST(v.rep_vec[t] AS DOUBLE))), (acc, x) -> acc + x)))
            AS c
        FROM assigned a JOIN repv v ON a.cell = v.cell)
      SELECT vec_id, CAST(cell AS INTEGER) AS cell, rep_id,
        floor(c * 10000) / 10000 AS cos_rep,
        (vec_id <> rep_id AND c > 0.2) AS is_dup
      FROM j ORDER BY vec_id""")),

    ("ann_ivf_topk", (s: SparkSession, d: String) => {
      val embeddings = table(s, d, "embeddings")
      val centroids = Similarity.sampleCentroids(embeddings, "vec_id", "embedding", 16)
      val assigned = Similarity.assignCells(embeddings, centroids, "vec_id", "embedding")
      val queries = embeddings.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.ivfTopK(assigned, centroids, queries,
          "vec_id", "embedding", "query_id", k = 5, nProbe = 4)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }, Some("""
      WITH cent AS (
        SELECT row_number() OVER (ORDER BY cid) - 1 AS cell, cvec FROM (
          SELECT vec_id AS cid, embedding AS cvec FROM embeddings
          ORDER BY (vec_id * 2654435761) % 2147483648, vec_id
          LIMIT 16)),
      assigned AS (
        SELECT vec_id, embedding, cell FROM (
          SELECT e.vec_id, e.embedding, c.cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC,
                c.cell) AS rr
          FROM embeddings e, cent c)
        WHERE rr = 1),
      probes AS (
        SELECT query_id, qv, cell FROM (
          SELECT q.vec_id AS query_id, q.embedding AS qv, c.cell,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY list_cosine_similarity(q.embedding, c.cvec) DESC,
                c.cell) AS pr
          FROM embeddings q, cent c WHERE q.vec_id < 10)
        WHERE pr <= 4),
      scored AS (
        SELECT p.query_id, s.vec_id AS neighbor_id,
          row_number() OVER (PARTITION BY p.query_id
            ORDER BY list_cosine_similarity(s.embedding, p.qv) DESC,
              s.vec_id) AS rank
        FROM assigned s JOIN probes p ON s.cell = p.cell)
      SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
      FROM scored WHERE rank <= 5
      ORDER BY query_id, rank""")),

    // Product-quantization ANN: vectors encode to ONE packed long of
    // per-subspace codeword indices (+ exact norm) — a 16x-compressed
    // scoring index — and queries score codes via an ADC lookup table
    // (8 array lookups per candidate, no vector arithmetic on the scan).
    // Codebook, encoding argmins, LUT dots, and the m-ordered ADC fold are
    // all deterministic f64 arithmetic, so the oracle replays the entire
    // index build and search bit-for-bit in DuckDB.
    ("ann_pq_topk", (s: SparkSession, d: String) => {
      val embeddings = table(s, d, "embeddings")
      val codebook = Similarity.pqCodebook(embeddings, "vec_id", "embedding")
      val encoded = Similarity.pqEncode(
        embeddings, "vec_id", "embedding", codebook)
      val queries = embeddings.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.pqTopK(encoded, codebook, queries, "query_id", "embedding",
          k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          (floor(col("score") * 10000) / 10000).as("approx_cos"))
        .orderBy("query_id", "rank")
    }, Some("""
      WITH cb AS (
        SELECT row_number() OVER (
            ORDER BY (vec_id * 2654435761) % 2147483648, vec_id) - 1 AS j,
          embedding AS cvec
        FROM embeddings
        QUALIFY j < 256),
      sp AS (SELECT unnest(range(8)) AS m),
      enc0 AS (
        SELECT e.vec_id, s.m, c.j,
          list_reduce(list_transform(range(1, 9),
            t -> (CAST(e.embedding[s.m * 8 + t] AS DOUBLE) -
                  CAST(c.cvec[s.m * 8 + t] AS DOUBLE)) *
                 (CAST(e.embedding[s.m * 8 + t] AS DOUBLE) -
                  CAST(c.cvec[s.m * 8 + t] AS DOUBLE))),
            (a, b) -> a + b) AS d2
        FROM embeddings e, sp s, cb c),
      enc AS (
        SELECT vec_id, m, j AS code FROM enc0
        QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, j) = 1),
      nrm AS (
        SELECT vec_id, sqrt(list_reduce(list_transform(range(1, 65),
          t -> CAST(embedding[t] AS DOUBLE) * CAST(embedding[t] AS DOUBLE)),
          (a, b) -> a + b)) AS nx
        FROM embeddings),
      lut AS (
        SELECT q.vec_id AS query_id, s.m, c.j,
          list_reduce(list_transform(range(1, 9),
            t -> CAST(q.embedding[s.m * 8 + t] AS DOUBLE) *
                 CAST(c.cvec[s.m * 8 + t] AS DOUBLE)),
            (a, b) -> a + b) AS dp
        FROM embeddings q, sp s, cb c
        WHERE q.vec_id < 10),
      num AS (
        SELECT l.query_id, e.vec_id AS neighbor_id,
          list_reduce(list(l.dp ORDER BY l.m), (a, b) -> a + b) AS adc
        FROM enc e JOIN lut l ON l.m = e.m AND l.j = e.code
        GROUP BY 1, 2),
      sc AS (
        SELECT n.query_id, n.neighbor_id, n.adc / (nn.nx * nq.nx) AS score
        FROM num n
        JOIN nrm nn ON nn.vec_id = n.neighbor_id
        JOIN nrm nq ON nq.vec_id = n.query_id),
      rk AS (
        SELECT query_id, neighbor_id, score,
          row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS rank
        FROM sc)
      SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
        floor(score * 10000) / 10000 AS approx_cos
      FROM rk WHERE rank <= 5 ORDER BY query_id, rank""")),

    // Deterministic train/val/test assignment: a pure function of doc_id
    // (multiplicative-hash bucket), so membership is stable across runs and
    // cluster sizes; the oracle replays the two-operator integer hash.
    ("pipeline_split", (s: SparkSession, d: String) => {
      graft.ops.Sampling.assignSplits(table(s, d, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("split")
    }, Some("""
      WITH b AS (
        SELECT doc_id,
          ((doc_id % 2147483647) * 2654435761) % 1000000 AS bucket
        FROM documents)
      SELECT CASE WHEN bucket < 800000 THEN 'train'
                  WHEN bucket < 900000 THEN 'val'
                  ELSE 'test' END AS split,
        count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM b GROUP BY 1 ORDER BY 1""")),

    // Mixture rebalancing: downsample each source to hit target mixture
    // weights — the output is the largest corpus every source can still
    // supply its share of (T = min count_s/target_s); sources outside the
    // target map drop. Two passes: a strata-sized count aggregate, then a
    // shuffle-free hash filter. The oracle replays the fraction
    // arithmetic and the bucket thresholds exactly.
    ("pipeline_mixture", (s: SparkSession, d: String) => {
      val targets = Map("src0" -> 0.05, "src1" -> 0.1, "src2" -> 0.15,
        "src3" -> 0.3, "src4" -> 0.4)
      graft.ops.Sampling
        .rebalanceStrata(table(s, d, "documents"), "source", "doc_id", targets)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("source")
    }, Some("""
      WITH tw(source, w) AS (VALUES
        ('src0', 0.05), ('src1', 0.1), ('src2', 0.15),
        ('src3', 0.3), ('src4', 0.4)),
      c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      t AS (SELECT min(c.n / tw.w) AS t FROM c JOIN tw USING (source)),
      f AS (
        SELECT c.source,
          CAST(floor(tw.w * t.t / c.n * 1000000 + 0.5) AS BIGINT) AS thr
        FROM c JOIN tw USING (source), t),
      b AS (
        SELECT doc_id, source,
          ((doc_id % 2147483647) * 2654435761) % 1000000 AS bucket
        FROM documents)
      SELECT b.source, count(*) AS n,
        min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM b JOIN f USING (source)
      WHERE b.bucket < f.thr
      GROUP BY 1 ORDER BY 1""")),

    // Token-budget selection: keep the highest-quality documents until a
    // global 15k-token budget is exhausted (ties broken by doc_id; the
    // budget-crossing document is included). The payload is never
    // shuffled — a narrow (score, cost, id) projection locates the exact
    // cutoff row, and because this query's OUTPUT is exactly that narrow
    // projection, the kept rows are read straight off the already-shuffled
    // narrow frame (selectByBudgetNarrow): the text is scanned and the
    // quality/token expressions evaluated ONCE, not re-run in a second
    // filtered scan. The oracle replays the rule as a QUALIFY running sum.
    ("pipeline_token_budget", (s: SparkSession, d: String) => {
      val docs = table(s, d, "documents")
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .withColumn("n_tokens",
          TextAnalysis.tokenCount(col("text")).cast("long"))
      graft.ops.Sampling
        .selectByBudgetNarrow(docs, "quality", "n_tokens", "doc_id",
          budget = 15000L)
        .select(col("doc_id"), col("quality"), col("n_tokens"))
        .orderBy("doc_id")
    }, Some(tokenBudgetOracle)),

    // Exact-k per-stratum sampling: a fixed 10-doc eval set per source,
    // membership a pure function of doc_id (stable under reruns and
    // corpus growth). The oracle replays the hash ranking verbatim.
    ("pipeline_sample_k", (s: SparkSession, d: String) => {
      graft.ops.Sampling.sampleKPerStratum(
          table(s, d, "documents"), "source", "doc_id", k = 10)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .orderBy("source", "doc_id")
    }, Some("""
      SELECT source, doc_id, n_chars FROM (
        SELECT source, doc_id, n_chars,
          row_number() OVER (PARTITION BY source
            ORDER BY (doc_id % 2147483647) * 2654435761 % 1000000, doc_id)
            AS rk
        FROM documents)
      WHERE rk <= 10 ORDER BY source, doc_id""")),

    // Sequence packing (concat-and-chunk): per source, documents in
    // doc_id order are concatenated and chopped into 2048-token training
    // chunks; a doc belongs to the chunk holding its first token (long
    // docs span forward). Output: per-chunk doc/token counts — the shape
    // a trainer's data loader consumes. The oracle replays the window
    // cumsum and integer division exactly.
    ("pipeline_pack", (s: SparkSession, d: String) => {
      val docs = table(s, d, "documents")
        .withColumn("n_tokens", TextAnalysis.regexTokenCount(col("text")))
      graft.ops.Sampling
        .packChunks(docs, "source", "doc_id", "doc_id", "n_tokens", 2048L)
        .groupBy(col("source"), col("chunk"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy("source", "chunk")
    }, Some("""
      WITH t AS (
        SELECT source, doc_id,
          CAST(len(regexp_extract_all(text,
            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS toks
        FROM documents),
      c AS (
        SELECT source, doc_id, toks,
          sum(toks) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t)
      SELECT source, CAST((cum - toks) // 2048 AS BIGINT) AS chunk,
        count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens
      FROM c GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Decontamination: per eval document (doc_id >= 450), the fraction of
    // its distinct bigrams found anywhere in the train partition — the
    // standard eval-leakage check, replayed exactly by the oracle.
    ("pipeline_contamination", (s: SparkSession, d: String) => {
      val docs = table(s, d, "documents")
      TextAnalysis.ngramContainment(
          docs.where(col("doc_id") < 450), docs.where(col("doc_id") >= 450),
          "doc_id", "text", n = 2)
        .orderBy("eval_id")
    }, Some("""
      WITH tr AS (
        SELECT DISTINCT unnest(list_distinct(list_transform(
          range(1, greatest(len(ws), 1)), i -> ws[i] || ' ' || ws[i + 1])))
          AS ngram
        FROM (SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
            x -> x <> '') AS ws
          FROM documents WHERE doc_id < 450)
        WHERE len(ws) >= 2),
      ev AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, greatest(len(ws), 1)), i -> ws[i] || ' ' || ws[i + 1])))
          AS ngram
        FROM (SELECT doc_id, list_filter(
            string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
          FROM documents WHERE doc_id >= 450)
        WHERE len(ws) >= 2),
      tot AS (SELECT doc_id, count(*) AS n_grams FROM ev GROUP BY 1),
      hits AS (
        SELECT doc_id, count(*) AS n_hits FROM ev
        WHERE ngram IN (SELECT ngram FROM tr) GROUP BY 1)
      SELECT t.doc_id AS eval_id, t.n_grams,
        coalesce(h.n_hits, 0) AS n_hits,
        floor(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / t.n_grams * 10000)
          / 10000 AS containment
      FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id
      ORDER BY eval_id""")),

    // BM25 retrieval: top-50 documents for a 3-term query. The oracle
    // replays the exact arithmetic (integer tf/df/dl/N, deterministic
    // integer-sum avgdl, same operator associativity), so document order —
    // rank-only output, like the ANN queries — hash-matches.
    ("text_bm25", (s: SparkSession, d: String) => {
      TextAnalysis.bm25TopK(table(s, d, "documents"), "doc_id", "text",
        Seq("hash", "join", "merge"), k1 = 1.2, b = 0.75, k = 50)
    }, Some("""
      WITH m AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(trim(text)), '\s+'),
            w -> w <> '') AS ws
        FROM documents),
      tf AS (
        SELECT doc_id, len(ws) AS dl,
          len(list_filter(ws, w -> w = 'hash')) AS tf_0,
          len(list_filter(ws, w -> w = 'join')) AS tf_1,
          len(list_filter(ws, w -> w = 'merge')) AS tf_2
        FROM m),
      stats AS (
        SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
          count(*) FILTER (tf_0 > 0) AS df_0,
          count(*) FILTER (tf_1 > 0) AS df_1,
          count(*) FILTER (tf_2 > 0) AS df_2
        FROM tf),
      scored AS (
        SELECT doc_id,
          ln(1.0 + (n_docs - CAST(df_0 AS DOUBLE) + 0.5)
              / (CAST(df_0 AS DOUBLE) + 0.5))
            * CAST(tf_0 AS DOUBLE) * 2.2
            / (CAST(tf_0 AS DOUBLE) + 1.2 * (1.0 - 0.75
              + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / n_docs))) +
          ln(1.0 + (n_docs - CAST(df_1 AS DOUBLE) + 0.5)
              / (CAST(df_1 AS DOUBLE) + 0.5))
            * CAST(tf_1 AS DOUBLE) * 2.2
            / (CAST(tf_1 AS DOUBLE) + 1.2 * (1.0 - 0.75
              + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / n_docs))) +
          ln(1.0 + (n_docs - CAST(df_2 AS DOUBLE) + 0.5)
              / (CAST(df_2 AS DOUBLE) + 0.5))
            * CAST(tf_2 AS DOUBLE) * 2.2
            / (CAST(tf_2 AS DOUBLE) + 1.2 * (1.0 - 0.75
              + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))
            AS score
        FROM tf, stats)
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        AS INTEGER) AS rank
      FROM scored ORDER BY score DESC, doc_id LIMIT 50""")),

    // Corpus-level n-gram statistics: document frequency of every bigram,
    // top 100 (ties broken lexically). The n-gram kernel is the dedup
    // shingle kernel, so the oracle reuses the minhash oracle's shingle
    // construction.
    ("text_ngram_stats", (s: SparkSession, d: String) => {
      graft.ops.TextAnalysis.ngramDocFrequencies(
          table(s, d, "documents"), "text", 2)
        .orderBy(col("doc_freq").desc, col("ngram"))
        .limit(100)
    }, Some("""
      WITH docs AS (
        SELECT doc_id, list_filter(
          string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        FROM documents),
      sh AS (
        SELECT unnest(list_distinct(
          list_transform(range(1, greatest(len(ws), 1)),
            i -> ws[i] || ' ' || ws[i + 1]))) AS ngram
        FROM docs WHERE len(ws) >= 2)
      SELECT ngram, count(*) AS doc_freq
      FROM sh GROUP BY 1
      ORDER BY doc_freq DESC, ngram LIMIT 100""")),

    // Per-language top-10 terms by document frequency: the vocabulary
    // census. One partial-aggregated (lang, term) count shuffle; the
    // rank filter executes as WindowGroupLimit, never a group-wide sort
    // of the full term census.
    ("text_top_terms", (s: SparkSession, d: String) => {
      TextAnalysis.topTermsByDocFreq(table(s, d, "documents"),
          "lang", "text", 10)
        .select(col("grp").as("lang"), col("term"), col("doc_freq"),
          col("rank"))
        .orderBy("lang", "rank")
    }, Some("""
      WITH docs AS (
        SELECT lang, list_distinct(list_filter(
          string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS ws
        FROM documents),
      t AS (SELECT lang, unnest(ws) AS term FROM docs),
      c AS (SELECT lang, term, count(*) AS doc_freq FROM t GROUP BY 1, 2),
      r AS (SELECT lang, term, doc_freq, row_number()
          OVER (PARTITION BY lang ORDER BY doc_freq DESC, term) AS rank
        FROM c)
      SELECT lang, term, doc_freq, CAST(rank AS INTEGER) AS rank
      FROM r WHERE rank <= 10 ORDER BY lang, rank""")),

    // Unigram LM cross-entropy scoring (the CCNet-style perplexity
    // quality filter): add-one-smoothed top-1024 vocabulary fit on the
    // corpus itself, documents scored in bits/token. The model fit is one
    // token-count shuffle + top-V; scoring broadcasts the log-prob table
    // inside ONE codegen'd expression (VocabLogProbSum) — the token
    // stream never explodes at scoring time. The oracle refits and
    // rescores the identical model in DuckDB (token-order fold ≡ join +
    // sum within the 1e-4 rounding).
    ("text_perplexity", (s: SparkSession, d: String) => {
      TextAnalysis.unigramXent(table(s, d, "documents"),
          "doc_id", "text", vocabSize = 1024)
        .select(col("doc_id"), col("n_tokens"),
          round(col("xent_bits"), 4).as("xent"))
        .orderBy("doc_id")
    }, Some("""
      WITH docs AS (
        SELECT doc_id, list_filter(
          string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        FROM documents),
      tok AS (SELECT doc_id, unnest(ws) AS t FROM docs),
      cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
      voc AS (SELECT t, c FROM cnt ORDER BY c DESC, t LIMIT 1024),
      vs AS (SELECT (SELECT count(*) FROM voc) AS v,
        (SELECT CAST(sum(c) AS DOUBLE) FROM cnt) AS n),
      sc AS (
        SELECT tok.doc_id, count(*) AS n_tokens,
          sum(coalesce(ln(voc.c + 1.0), 0.0) - ln(vs.n + vs.v + 1.0)) AS lp
        FROM tok LEFT JOIN voc ON tok.t = voc.t CROSS JOIN vs
        GROUP BY 1)
      SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
        round(-lp / (n_tokens * ln(2.0)), 4) AS xent
      FROM sc ORDER BY doc_id""")),

    // PII screen: per-document match counts for each pattern plus the md5
    // of the redacted text — the pre-release scrub every training corpus
    // runs. The synthetic corpus is PII-free (all counts 0, redaction is
    // the identity), so the non-trivial behavior is pinned by the
    // OpsSpec redaction tests on constructed documents; the oracle still
    // replays the identical RE2-safe regexes end-to-end in DuckDB.
    ("text_pii", (s: SparkSession, d: String) => {
      val base = table(s, d, "documents")
      TextAnalysis.piiCounts(col("text"))
        .foldLeft(base) { case (acc, (name, c)) => acc.withColumn(name, c) }
        .withColumn("redacted_md5", md5(TextAnalysis.redactPii(col("text"))))
        .select(col("doc_id"), col("n_email"), col("n_ipv4"), col("n_ssn"),
          col("redacted_md5"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
        len(regexp_extract_all(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        len(regexp_extract_all(text,
          '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ipv4,
        len(regexp_extract_all(text,
          '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS n_ssn,
        md5(regexp_replace(regexp_replace(regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
          '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<ipv4>', 'g'),
          '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<ssn>', 'g')) AS redacted_md5
      FROM documents ORDER BY doc_id""")),

    // Boilerplate annotation: fraction of each document's distinct 3-grams
    // with corpus-wide document frequency >= 3 — the C4-style span-level
    // screen between exact dedup and near-dup. The common-gram set is
    // bounded by totalGrams/minDf and broadcasts; grams never shuffle.
    ("text_boilerplate", (s: SparkSession, d: String) => {
      TextAnalysis.boilerplateNgramFraction(
          table(s, d, "documents"), "doc_id", "text", n = 3, minDf = 3L)
        .orderBy("doc_id")
    }, Some("""
      WITH t AS (
        SELECT doc_id, list_filter(
          string_split_regex(lower(trim(text)), '\s+'), w -> w <> '') AS ws
        FROM documents),
      d AS (
        SELECT doc_id, CASE WHEN len(ws) >= 3 THEN list_distinct(
            list_transform(range(1, len(ws) - 1),
              i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]))
          ELSE [] END AS grams
        FROM t),
      g AS (SELECT doc_id, unnest(grams) AS gram FROM d),
      common AS (
        SELECT gram FROM g GROUP BY 1 HAVING count(*) >= 3),
      hits AS (
        SELECT g.doc_id, count(*) AS n_common
        FROM g JOIN common c ON c.gram = g.gram GROUP BY 1)
      SELECT d.doc_id, CAST(len(d.grams) AS BIGINT) AS n_grams,
        CAST(coalesce(h.n_common, 0) AS BIGINT) AS n_common,
        floor(CAST(coalesce(h.n_common, 0) AS DOUBLE) /
          greatest(len(d.grams), 1) * 10000.0) / 10000.0 AS boilerplate_frac
      FROM d LEFT JOIN hits h ON h.doc_id = d.doc_id
      ORDER BY d.doc_id""")),

    ("text_tokens", (s: SparkSession, d: String) => {
      val docs = table(s, d, "documents")
      docs.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.regexTokenCount(col("text")).as("n_bpe_tokens"),
          length(col("text")).as("len_chars"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
        CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
          w -> w <> '')) AS INTEGER) AS n_tokens,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
          AS INTEGER) AS n_bpe_tokens,
        CAST(length(text) AS INTEGER) AS len_chars,
        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM documents ORDER BY doc_id""")),

    // Region-robust rolling-hash fingerprints (Manber 0-mod-q): one row per
    // selected k-gram hash; the polynomial rolling hash is replayed by the
    // oracle from the normalized text.
    ("text_fingerprint", (s: SparkSession, d: String) => {
      table(s, d, "documents")
        .select(col("doc_id"),
          explode(TextAnalysis.rollingFingerprint(col("text"))).as("fp_hash"))
        .orderBy("doc_id", "fp_hash")
    }, Some("""
      WITH norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
        FROM documents),
      hs AS (
        SELECT doc_id, unnest(list_transform(
          range(1, greatest(length(s) - 16 + 2, 1)),
          pos -> list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(pos, pos + 16),
              i -> CAST(unicode(s[i]) AS BIGINT))),
            (acc, c) -> (acc * 131 + c) % 2147483647))) AS h
        FROM norm WHERE length(s) >= 16)
      SELECT DISTINCT doc_id, h AS fp_hash
      FROM hs WHERE h % 16 = 0
      ORDER BY doc_id, fp_hash""")),

    ("text_langid", (s: SparkSession, d: String) => {
      table(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_id"))
        .orderBy("doc_id")
    }, Some(langIdOracle)),

    ("text_quality", (s: SparkSession, d: String) => {
      table(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }, Some(qualityOracle)),

    // Repetition filters (Gopher-style): duplicated-line character mass
    // and repeated-2-gram fraction per document — the cheap degenerate-text
    // screens (boilerplate pages, generation loops) a corpus pipeline runs
    // before anything expensive. The oracle replays both signals with
    // DuckDB list lambdas over the identical tokenization.
    ("text_repetition", (s: SparkSession, d: String) => {
      table(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.duplicateNgramFraction(col("text"), 2)
            .as("dup_2gram_frac"),
          TextAnalysis.duplicateNgramFraction(col("text"), 3)
            .as("dup_3gram_frac"))
        .orderBy("doc_id")
      // (duplicateLineCharFraction is spec-tested on multi-line docs: the
      // synthetic corpus is single-line, so it carries no oracle signal.)
    }, Some("""
      WITH t AS (
        SELECT doc_id,
          list_filter(string_split_regex(lower(trim(text)), '\s+'),
            w -> w <> '') AS ws
        FROM documents),
      m AS (
        SELECT doc_id,
          list_transform(range(1, len(ws)),
            i -> ws[i] || ' ' || ws[i + 1]) AS g2,
          list_transform(range(1, len(ws) - 1),
            i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]) AS g3
        FROM t)
      SELECT doc_id,
        floor(CASE WHEN len(g2) > 0 THEN
            (len(g2) - len(list_distinct(g2))) / CAST(len(g2) AS DOUBLE)
          ELSE 0 END * 10000) / 10000 AS dup_2gram_frac,
        floor(CASE WHEN len(g3) > 0 THEN
            (len(g3) - len(list_distinct(g3))) / CAST(len(g3) AS DOUBLE)
          ELSE 0 END * 10000) / 10000 AS dup_3gram_frac
      FROM m ORDER BY doc_id""")),

    // Multimodal: binary blobs + typed metadata; byte counts are
    // SQL-checkable, decoded features are engine-defined (spec-tested).
    ("multimodal_meta", (s: SparkSession, d: String) => {
      val assets = Multimodal.synthesizeAssets(
        table(s, d, "documents"), "doc_id", "text", "image")
      assets.select(col("asset_id"), col("modality"),
          octet_length(col("blob").cast("string")).as("n_bytes"),
          col("meta.width"), col("meta.height"))
        .orderBy("asset_id")
    }, Some("""
      WITH m AS (
        SELECT doc_id AS asset_id,
          CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
        FROM documents)
      SELECT asset_id, 'image' AS modality, CAST(n AS INTEGER) AS n_bytes,
        CAST((n * 2654435761) % 1920 + 1 AS INTEGER) AS width,
        CAST((n * 19349663 + 7) % 1080 + 1 AS INTEGER) AS height
      FROM m ORDER BY asset_id""")),

    // Frame-sampling plan: frame timestamps derived from the synthesized
    // duration metadata; the count is fully SQL-checkable.
    ("multimodal_frames", (s: SparkSession, d: String) => {
      val videos = Multimodal.synthesizeAssets(
        table(s, d, "documents"), "doc_id", "text", "video")
      Multimodal.frameSamplePlan(videos, everyMs = 1000L)
        .select(col("asset_id"), col("meta.duration_ms"), col("n_frames"))
        .orderBy("asset_id")
    }, Some("""
      WITH m AS (
        SELECT doc_id AS asset_id,
          CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n
        FROM documents)
      SELECT asset_id,
        (n * 73856093) % 600000 AS duration_ms,
        CAST((n * 73856093) % 600000 // 1000 + 1 AS INTEGER) AS n_frames
      FROM m ORDER BY asset_id""")),

    // The flagship composition: the full corpus-cleaning pipeline a
    // training-data run would execute — quality filter, exact dedup,
    // MinHash near-dedup with transitive cluster resolution, deterministic
    // split assignment — and the DuckDB oracle replays EVERY stage, so the
    // composed pipeline (not just its operators) is hash-checked.
    ("pipeline_clean", (s: SparkSession, d: String) => {
      val docs = table(s, d, "documents")
      val scored = docs.select(col("doc_id"), col("text"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      val filtered = scored.where(col("quality") >= 0.5)
      // `exact` feeds both the near-dup candidate pipeline and the final
      // anti-join's left side; cache it so the scan + quality scoring +
      // exact-dedup shuffle run once per execution, not per consumer.
      val exact = Dedup.dropExactDuplicates(filtered, "doc_id", Seq("text"))
        .cache()
      val pairs = Dedup.minhashDuplicatePairs(exact, "doc_id", "text",
        threshold = 0.7, numHashes = 128, bands = 16, shingleK = 2)
      val clean = Dedup.dropNearDuplicates(exact, "doc_id", pairs)
      graft.ops.Sampling.assignSplits(clean, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("split")
    }, Some(cleanPipelineOracle)),

    // The STUB decode (byte histogram folded to 16 buckets, f32-normalized)
    // is deterministic, so even the stub is oracled: bucket 0 of an ASCII
    // payload counts the bytes ≡ 0 (mod 16). Floor-scaling (not round) keeps
    // the comparison stable on the bit-identical doubles both engines see.
    ("multimodal_decode", (s: SparkSession, d: String) => {
      val assets = Multimodal.synthesizeAssets(
        table(s, d, "documents"), "doc_id", "text", "image")
      Multimodal.decodeAndFeaturize(assets, dim = 16)
        .select(col("asset_id"), col("n_bytes"),
          (floor(element_at(col("features"), 1).cast("double") * 10000d) / 10000d)
            .as("f0"))
        .orderBy("asset_id")
    }, Some("""
      WITH m AS (
        SELECT doc_id AS asset_id,
          CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
          len(list_filter(string_split(text, ''),
            c -> unicode(c) % 16 = 0)) AS b0
        FROM documents)
      SELECT asset_id, n_bytes,
        floor(CAST(CAST(b0 AS FLOAT4) / CAST(greatest(n_bytes, 1) AS FLOAT4)
          AS DOUBLE) * 10000) / 10000 AS f0
      FROM m ORDER BY asset_id""")))

  private def langIdOracle: String = {
    // Mirror TextAnalysis.langId exactly: stopword hit counts per language
    // (sorted lang keys), argmax with ties to the alphabetically first.
    val langs = TextAnalysis.stopwords.toSeq.sortBy(_._1)
    val scores = langs.map { case (lang, sw) =>
      val list = sw.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), " +
        s"w -> list_contains([$list], w))) AS score_$lang"
    }.mkString(",\n          ")
    val best = langs.map(l => s"score_${l._1}").mkString("greatest(", ", ", ")")
    val cases = langs.map { case (lang, _) =>
      s"WHEN score_$lang = best AND best > 0 THEN '$lang'"
    }.mkString("\n          ")
    s"""
      WITH scored AS (
        SELECT doc_id,
          $scores
        FROM documents),
      ranked AS (SELECT doc_id, $best AS best, * FROM scored)
      SELECT doc_id,
        CASE $cases ELSE 'und' END AS lang_id
      FROM ranked ORDER BY doc_id"""
  }

  /** The cleaning pipeline's oracle: quality metric, md5 exact dedup,
    * the MinHash signature/band/verify replay, a recursive-CTE component
    * closure, and the split-bucket hash — each stage the exact SQL replay
    * of the operator the Spark side composes.
    */
  private def cleanPipelineOracle: String = {
    val en = TextAnalysis.stopwords("en").map(w => s"'$w'").mkString(", ")
    s"""
      WITH RECURSIVE m AS (
        SELECT doc_id, text,
          len(list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> ''))
            AS n_tokens,
          length(text) AS n_chars,
          len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
            w -> list_contains([$en], w))) AS sw_hits,
          length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
        FROM documents),
      q AS (
        SELECT doc_id, text,
          floor(least(CAST(n_tokens AS DOUBLE) / 32.0, 1.0) *
            (0.5 + least((floor(CAST(sw_hits AS DOUBLE) / greatest(n_tokens, 1)
                  * 10000.0) / 10000.0) * 5.0, 1.0) * 0.25 +
              (floor(CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1) * 10000.0)
                / 10000.0) * 0.25) * 10000.0) / 10000.0 AS quality
        FROM m),
      filtered AS (SELECT doc_id, text FROM q WHERE quality >= 0.5),
      exact AS (
        SELECT doc_id, text FROM (
          SELECT doc_id, text,
            row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM filtered) WHERE rn = 1),
      docs2 AS (
        SELECT doc_id, list_filter(
          string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS ws
        FROM exact),
      sh AS (
        SELECT doc_id, unnest(list_distinct(
          list_transform(range(1, greatest(len(ws), 1)),
            i -> ws[i] || ' ' || ws[i + 1]))) AS shingle
        FROM docs2 WHERE len(ws) >= 2),
      hh AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(7 AS BIGINT),
            list_transform(string_split(shingle, ''),
              c -> CAST(unicode(c) AS BIGINT))),
            (acc, c) -> (acc * 131 + c) % 2147483647) AS h1,
          list_reduce(list_prepend(CAST(13 AS BIGINT),
            list_transform(string_split(shingle, ''),
              c -> CAST(unicode(c) AS BIGINT))),
            (acc, c) -> (acc * 131 + c) % 2147483647) AS h2
        FROM sh),
      sig AS (
        SELECT doc_id, i.i AS i, min((h1 + i.i * h2) % 2147483647) AS v
        FROM hh, (SELECT unnest(range(128)) AS i) i
        GROUP BY doc_id, i.i),
      bands AS (
        SELECT doc_id, i // 8 AS band,
          string_agg(v, ',' ORDER BY i) AS band_key
        FROM sig GROUP BY doc_id, i // 8),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id),
      shs AS (
        SELECT doc_id, list_distinct(
          list_transform(range(1, greatest(len(ws), 1)),
            i -> ws[i] || ' ' || ws[i + 1])) AS sset
        FROM docs2),
      pairs AS (
        SELECT c.id_a, c.id_b FROM cand c
        JOIN shs a ON a.doc_id = c.id_a
        JOIN shs b ON b.doc_id = c.id_b
        WHERE CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
          (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset)))
          >= 0.7),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      losers AS (
        SELECT src AS doc_id FROM reach GROUP BY src
        HAVING min(dst) < src),
      clean AS (
        SELECT doc_id FROM exact
        WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
      b AS (
        SELECT doc_id,
          ((doc_id % 2147483647) * 2654435761) % 1000000 AS bucket
        FROM clean)
      SELECT CASE WHEN bucket < 800000 THEN 'train'
                  WHEN bucket < 900000 THEN 'val'
                  ELSE 'test' END AS split,
        count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM b GROUP BY 1 ORDER BY 1"""
  }

  private def tokenBudgetOracle: String = {
    val en = TextAnalysis.stopwords("en").map(w => s"'$w'").mkString(", ")
    s"""
      WITH m AS (
        SELECT doc_id,
          len(list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> ''))
            AS n_tokens,
          length(text) AS n_chars,
          len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
            w -> list_contains([$en], w))) AS sw_hits,
          length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
        FROM documents),
      q AS (
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
          floor(least(CAST(n_tokens AS DOUBLE) / 32.0, 1.0) *
            (0.5 + least((floor(CAST(sw_hits AS DOUBLE) / greatest(n_tokens, 1)
                  * 10000.0) / 10000.0) * 5.0, 1.0) * 0.25 +
              (floor(CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1) * 10000.0)
                / 10000.0) * 0.25) * 10000.0) / 10000.0
            AS quality
        FROM m)
      SELECT doc_id, quality, n_tokens FROM q
      QUALIFY sum(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens < 15000
      ORDER BY doc_id"""
  }

  private def qualityOracle: String = {
    val en = TextAnalysis.stopwords("en").map(w => s"'$w'").mkString(", ")
    s"""
      WITH m AS (
        SELECT doc_id,
          len(list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> ''))
            AS n_tokens,
          length(text) AS n_chars,
          len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
            w -> list_contains([$en], w))) AS sw_hits,
          length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
        FROM documents)
      SELECT doc_id,
        floor(least(CAST(n_tokens AS DOUBLE) / 32.0, 1.0) *
          (0.5 + least((floor(CAST(sw_hits AS DOUBLE) / greatest(n_tokens, 1)
                * 10000.0) / 10000.0) * 5.0, 1.0) * 0.25 +
            (floor(CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1) * 10000.0)
              / 10000.0) * 0.25) * 10000.0) / 10000.0
          AS quality
      FROM m ORDER BY doc_id"""
  }
}
