package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tsdb.SparkTestSession

class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()
  private lazy val embeddings =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("exact dedup finds planted duplicates") {
    val withDups = docs.select($"doc_id", $"text")
      .unionAll(docs.where($"doc_id" < 5)
        .select($"doc_id" + 10000, $"text"))
    val groups = Dedup.exactGroups(withDups, "doc_id", Seq("text"))
    assert(groups.count() == docs.count()) // dups collapse into originals
    assert(groups.where($"dup_count" === 2).count() == 5)
    val kept = Dedup.dropExactDuplicates(withDups, "doc_id", Seq("text"))
    assert(kept.count() == docs.count())
    assert(kept.where($"doc_id" >= 10000).count() == 0) // min id kept
  }

  test("minhash lsh finds planted near-duplicates") {
    // Plant near-dups: copy five docs with one word appended.
    val nearDups = docs.where($"doc_id" < 5)
      .select(($"doc_id" + 20000).as("doc_id"),
        concat($"text", lit(" extra")).as("text"))
    val corpus = docs.select($"doc_id", $"text").unionAll(nearDups)
    val pairs = Dedup.minhashDuplicatePairs(corpus, "doc_id", "text",
      threshold = 0.7)
    val found = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 5).foreach { i =>
      assert(found.contains((i.toLong, i + 20000L)),
        s"expected near-dup pair ($i, ${i + 20000})")
    }
  }

  test("simhash pairs are exactly the chunk-sharing pairs within distance") {
    val sig = docs.limit(10).select($"doc_id", Dedup.simhash($"text").as("sig"))
    val joined = sig.as("a").join(sig.as("b"), $"a.doc_id" === $"b.doc_id")
      .select(Dedup.hamming($"a.sig", $"b.sig")).collect()
    assert(joined.forall(_.getInt(0) == 0))

    // Exact duplicates (distance 0) are always found.
    val dups = docs.where($"doc_id" < 3)
      .select(($"doc_id" + 30000).as("doc_id"), $"text")
    val corpus = docs.select($"doc_id", $"text").unionAll(dups)
    val maxDistance = 12
    val pairs = Dedup.simhashDuplicatePairs(corpus, "doc_id", "text", maxDistance)
    val found = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert((0 until 3).forall(i => found.get((i.toLong, i + 30000L)).contains(0)))

    // Contract: the result is exactly every pair sharing >= 1 of the 4
    // 16-bit chunks with Hamming distance <= maxDistance, no more, no less.
    val sigs = corpus.select($"doc_id", Dedup.simhash($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    def chunks(s: Long) = (0 until 4).map(c => (s >>> (c * 16)) & 0xffffL)
    val expected = (for {
      ((ia, sa), x) <- sigs.zipWithIndex
      (ib, sb) <- sigs.drop(x + 1)
      if chunks(sa).zip(chunks(sb)).exists { case (a, b) => a == b }
      d = java.lang.Long.bitCount(sa ^ sb)
      if d <= maxDistance
    } yield (ia, ib) -> d).toMap
    assert(found == expected)
  }

  test("ngram jaccard pairs match brute force without a cartesian join") {
    // Near-dups (one word appended) + exact dups + disjoint docs.
    val corpus = docs.where($"doc_id" < 120).select($"doc_id", $"text")
      .unionAll(docs.where($"doc_id" < 5)
        .select(($"doc_id" + 40000).as("doc_id"),
          concat($"text", lit(" extra")).as("text")))
      .unionAll(docs.where($"doc_id" < 3)
        .select(($"doc_id" + 50000).as("doc_id"), $"text"))
    val got = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 1, threshold = 0.6)

    // Brute force over collected shingle sets.
    val sets = corpus.collect().map { r =>
      r.getLong(0) -> Signatures.wordShingles(r.getString(1), 1)
    }.sortBy(_._1)
    val expected = (for {
      ((ia, sa), x) <- sets.zipWithIndex
      (ib, sb) <- sets.drop(x + 1)
      j = Signatures.jaccard(sa, sb)
      if j >= 0.6
    } yield (ia, ib) -> j).toMap
    val found = got.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(found.keySet == expected.keySet)
    found.foreach { case (k, j) => assert(math.abs(j - expected(k)) < 1e-12) }
    assert(expected.exists { case ((_, b), _) => b >= 40000L },
      "test corpus must actually contain near-dup pairs")

    // The prefix-filtered plan must never fall back to a cartesian or
    // nested-loop product — that is the whole point of the rewrite.
    val physical = got.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"), "cartesian product in plan")
    assert(!physical.contains("BroadcastNestedLoopJoin"), "nested loop join in plan")

    // Threshold 0 would make the OUTPUT quadratic; the operator refuses.
    assertThrows[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 1, threshold = 0.0)
    }
  }

  test("prefix-filtered jaccard equals brute force across random corpora") {
    // Randomized (seeded) cross-check of the AllPairs prefix bound at
    // several thresholds — an off-by-one in the prefix length silently
    // loses pairs, which no single fixture reliably catches.
    val rng = new scala.util.Random(20260812L)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val corpus = (0 until 60).map { i =>
      val len = 1 + rng.nextInt(12)
      (i.toLong, Seq.fill(len)(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    val sets = corpus.map { case (id, t) => id -> Signatures.wordShingles(t, 1) }
    for (threshold <- Seq(0.3, 0.62, 0.9)) {
      val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", 1, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        ((ia, sa), x) <- sets.zipWithIndex
        (ib, sb) <- sets.drop(x + 1)
        if Signatures.jaccard(sa, sb) >= threshold
      } yield (ia, ib)).toSet
      assert(got == want, s"mismatch at threshold $threshold: " +
        s"missing=${want -- got} extra=${got -- want}")
    }
  }

  test("simhash survives a degenerate identical-signature corpus") {
    // Thousands of near-empty documents hash to ONE signature: blocking
    // over distinct signatures sees a single row, and the inherently
    // quadratic intra-group output is generated by the blocked self-join
    // instead of one hot bucket task.
    val n = 3000
    val degenerate = spark.range(n).select(col("id").as("doc_id"), lit("").as("text"))
      .unionAll(docs.where($"doc_id" < 50)
        .select(($"doc_id" + 100000).as("doc_id"), $"text"))
    val pairs = Dedup.simhashDuplicatePairs(degenerate, "doc_id", "text",
      maxDistance = 3)
    val emptyPairs = pairs.where($"id_a" < n && $"id_b" < n)
    assert(emptyPairs.count() == n.toLong * (n - 1) / 2,
      "every identical-signature pair must be emitted exactly once")
    assert(pairs.where($"id_a" < n && $"id_b" < n && $"distance" =!= 0).count() == 0)
  }

  test("cluster contraction resolves a 1000-node chain with defaults") {
    // One-hop label propagation would need 999 rounds here; star
    // contraction (pointer-doubling) needs O(log n), so the DEFAULT
    // iteration cap must suffice — the scale-correctness contract.
    val chain = (0 until 999).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val clusters = Dedup.clusterDuplicates(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size == 1000)
    assert(clusters.values.forall(_ == 0L))
  }

  test("cluster contraction fails loudly when the iteration cap is hit") {
    // With maxIterations = 1 even a 4-node chain cannot finish; the
    // operator must throw instead of silently returning a partial merge.
    val chain = (0 until 3).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.clusterDuplicates(chain, maxIterations = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("embedding near-dup pairs find planted copies") {
    val planted = embeddings.where($"vec_id" < 3)
      .select(($"vec_id" + 40000).as("vec_id"), $"embedding", $"label")
    val corpus = embeddings.unionAll(planted)
    val pairs = Dedup.embeddingDuplicatePairs(corpus, "vec_id", "embedding",
      threshold = 0.999)
    val found = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 3).forall(i => found.contains((i.toLong, i + 40000L))))
  }

  test("brute-force ann: self is the nearest neighbor") {
    val queries = embeddings.where($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val topk = Similarity.bruteForceTopK(
      embeddings, queries, "vec_id", "embedding", "query_id", k = 3)
    val best = topk.where($"rank" === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 5).foreach(i => assert(best(i.toLong) == i.toLong,
      s"query $i nearest neighbor should be itself"))
  }

  test("lsh ann surfaces self-matches and real neighbors") {
    val queries = embeddings.where($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val topk = Similarity.lshTopK(embeddings, queries,
      "vec_id", "embedding", "query_id", k = 3)
    val best = topk.where($"rank" === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 5).foreach(i => assert(best(i.toLong) == i.toLong,
      s"query $i must surface itself (identical vectors collide in all bands)"))
  }

  test("ivf ann recalls the self-match with enough probes") {
    val centroids = Similarity.sampleCentroids(embeddings, "vec_id", "embedding", 8)
    val assigned = Similarity.assignCells(embeddings, centroids, "vec_id", "embedding")
    assert(assigned.count() == embeddings.count())
    val queries = embeddings.where($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val topk = Similarity.ivfTopK(assigned, centroids, queries,
      "vec_id", "embedding", "query_id", k = 3, nProbe = 8)
    val best = topk.where($"rank" === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 5).foreach(i => assert(best(i.toLong) == i.toLong))
  }

  test("duplicate clusters propagate transitively and drop to one keeper") {
    // Chain 1-2, 2-3 plus island 7-8: clusters {1,2,3} and {7,8}.
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val clusters = Dedup.clusterDuplicates(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))

    val corpus = (1L to 10L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(corpus, "doc_id",
        pairs.toDF("id_a", "id_b"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L, 6L, 7L, 9L, 10L))
  }

  test("as-of join picks the latest preceding right row per key") {
    val left = Seq(
      (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 250L),
      (4L, "b", 100L), (5L, "c", 500L))
      .toDF("id", "k", "ts")
    val right = Seq(
      ("a", 100L, 10.0), ("a", 240L, 24.0), ("a", 300L, 30.0),
      ("b", 150L, 15.0))
      .toDF("k", "ts", "v")
    val joined = AsOf.joinBackward(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    assert(joined(1L).contains(10.0)) // inclusive at equal ts
    assert(joined(2L).contains(10.0)) // 240 is later than 200
    assert(joined(3L).contains(24.0))
    assert(joined(4L).isEmpty)        // b's only right row is later
    assert(joined(5L).isEmpty)        // c has no right rows

    // Tolerance nulls out stale matches.
    val tol = AsOf.joinBackward(left, right, Seq("k"), "ts", "ts", Seq("v"),
        toleranceUs = Some(20L))
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    assert(tol(1L).contains(10.0))  // age 0
    assert(tol(2L).isEmpty)         // age 100 > 20
    assert(tol(3L).contains(24.0))  // age 10
  }

  test("as-of join matches a brute-force reference on random data") {
    val rng = new scala.util.Random(42)
    val leftRows = (0 until 400).map(i =>
      (i.toLong, s"k${rng.nextInt(8)}", rng.nextInt(1000).toLong))
    val rightRows = (0 until 150).map(i =>
      (s"k${rng.nextInt(10)}", rng.nextInt(1000).toLong, i.toDouble))
      // unique per (key, ts): keep the max value like callers should
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val left = leftRows.toDF("id", "k", "ts")
    val right = rightRows.toDF("k", "ts", "v")

    val got = AsOf.joinBackward(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    val expected = leftRows.map { case (id, k, ts) =>
      val candidates = rightRows.filter(r => r._1 == k && r._2 <= ts)
      id -> (if (candidates.isEmpty) None
             else Some(candidates.maxBy(_._2)._3))
    }.toMap
    assert(got == expected)
  }

  test("persisted IVF index probes with partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val centroids = Similarity.sampleCentroids(embeddings, "vec_id", "embedding", 8)
    val assigned = Similarity.assignCells(embeddings, centroids, "vec_id", "embedding")
    Similarity.writeIvfIndex(assigned, dir)

    val queries = embeddings.where($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val probed = Similarity.probeIvfIndex(spark, dir, centroids, queries,
      "vec_id", "embedding", "query_id", k = 3, nProbe = 2)
    val direct = Similarity.ivfTopK(assigned, centroids, queries,
      "vec_id", "embedding", "query_id", k = 3, nProbe = 2)
    assert(probed.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet ==
      direct.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet)

    // The scan over the index must be statically pruned to the probed
    // cells (partition filter on the cell partition column).
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"expected a cell partition filter on the IVF index scan:\n$plan")
  }

  test("deterministic splits are stable, exhaustive, and disjoint") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val once = Sampling.assignSplits(docs, "doc_id", splits)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // Repartitioning must not move any row between splits.
    val again = Sampling.assignSplits(docs.repartition(13), "doc_id", splits)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once == again, "split membership must be partitioning-independent")
    assert(once.size == docs.count(), "every row gets exactly one split")
    val byName = once.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    assert(byName("train") > byName("val") && byName("train") > byName("test"))

    // sampleByKey(f) is exactly the bucket-threshold subset, and a larger
    // fraction strictly contains a smaller one (nested samples).
    val small = Sampling.sampleByKey(docs, "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = Sampling.sampleByKey(docs, "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large), "samples must be nested by fraction")
    assert(small.nonEmpty && large.size < docs.count())

    // Stratified: absent strata drop, present ones follow their fraction.
    val strat = Sampling.stratifiedSampleByKey(
      docs.withColumn("bucket2",
        (col("doc_id") % 2 === 0).cast("string")),
      "bucket2", "doc_id", Map("true" -> 1.0))
    assert(strat.where(col("doc_id") % 2 =!= 0).count() == 0)
    assert(strat.count() == docs.where(col("doc_id") % 2 === 0).count())
  }

  test("pq index compresses vectors to one long and keeps useful recall") {
    val cb = Similarity.pqCodebook(embeddings, "vec_id", "embedding")
    assert(cb.length == 256 && cb.head.length == 64)
    val encoded = Similarity
      .pqEncode(embeddings, "vec_id", "embedding", cb).cache()
    assert(encoded.schema.fields.map(_.dataType.typeName).toSeq ==
      Seq("long", "long", "double"),
      "the scoring index must be (id, packed code, norm) — 24 bytes/row")

    // Kernel pinning: expression outputs equal an independent reference
    // computation (argmin L2 per subspace, ties to the smallest index;
    // f64 index-order folds).
    val raw = embeddings.select($"vec_id", $"embedding").limit(20)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = encoded.where($"id".isin(raw.keys.toSeq: _*))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    raw.foreach { case (id, v) =>
      var expect = 0L
      for (mm <- 0 until 8) {
        var best = 0; var bestD = Double.PositiveInfinity
        for (j <- cb.indices) {
          var d = 0.0
          for (t <- 0 until 8) {
            val diff = v(mm * 8 + t).toDouble - cb(j)(mm * 8 + t).toDouble
            d += diff * diff
          }
          if (d < bestD) { bestD = d; best = j }
        }
        expect |= best.toLong << (mm * 8)
      }
      val refNorm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      assert(got(id)._1 == expect, s"code of $id")
      assert(got(id)._2 == refNorm, s"norm of $id")
    }

    // Recall@5 vs the exact brute-force baseline on real embeddings.
    val queries = embeddings.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = df
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val pq = topSets(Similarity.pqTopK(
      encoded, cb, queries, "query_id", "embedding", k = 5))
    val exact = topSets(Similarity.bruteForceTopK(
      embeddings, queries, "vec_id", "embedding", "query_id", k = 5))
    val recalls = exact.map { case (q, e) => (pq(q) & e).size.toDouble / e.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@5 $mean below floor (16x compression)")
    encoded.unpersist()
  }

  test("ivf+pq composition prunes cells and scores codes") {
    val cb = Similarity.pqCodebook(embeddings, "vec_id", "embedding")
    val centroids = Similarity.sampleCentroids(embeddings, "vec_id", "embedding", 16)
    val cells = Similarity.assignCells(embeddings, centroids, "vec_id", "embedding")
      .select(col("vec_id"), col("cell"))
    val codes = Similarity.pqEncode(embeddings, "vec_id", "embedding", cb)
    val assignedCodes = codes.join(cells, codes("id") === cells("vec_id"))
      .select(col("id"), col("cell"), col("code"), col("norm"))
    val queries = embeddings.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")

    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = df
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // Probing EVERY cell must equal plain PQ over the full corpus — the
    // composition changes what is read, never how it is scored.
    val all = sets(Similarity.ivfPqTopK(assignedCodes, centroids, cb,
      queries, "id", "embedding", "query_id", k = 5, nProbe = 16))
    val pqOnly = sets(Similarity.pqTopK(codes, cb, queries,
      "query_id", "embedding", k = 5))
    assert(all == pqOnly, "nProbe=all must reduce to plain PQ")

    // Pruned probing keeps useful recall against the exact baseline.
    val pruned = sets(Similarity.ivfPqTopK(assignedCodes, centroids, cb,
      queries, "id", "embedding", "query_id", k = 5, nProbe = 4))
    val exact = sets(Similarity.bruteForceTopK(embeddings, queries,
      "vec_id", "embedding", "query_id", k = 5))
    val recalls = exact.map { case (q, e) => (pruned(q) & e).size.toDouble / e.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"ivf+pq mean recall@5 $mean below floor")
  }

  test("token-budget selection matches the running-sum rule exactly") {
    import org.apache.spark.sql.expressions.Window
    val scored = docs
      .withColumn("quality", TextAnalysis.qualityScore($"text"))
      .withColumn("cost", TextAnalysis.tokenCount($"text").cast("long"))
    val w = Window.orderBy($"quality".desc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def oracle(budget: Long): Set[Long] = scored
      .withColumn("cum", sum($"cost").over(w) - $"cost")
      .where($"cum" < budget).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    for (budget <- Seq(1L, 500L, 5000L, 20000L)) {
      val got = Sampling.selectByBudget(scored, "quality", "cost", "doc_id", budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == oracle(budget), s"budget $budget")
    }
    // Budget >= grand total keeps everything; 0 keeps nothing.
    val total = scored.agg(sum($"cost")).head.getLong(0)
    assert(Sampling.selectByBudget(scored, "quality", "cost", "doc_id", total)
      .count() == docs.count())
    assert(Sampling.selectByBudget(scored, "quality", "cost", "doc_id", 0L)
      .count() == 0)
    // Null and NaN scores are never selected, even with room in the budget.
    val withBad = scored.unionByName(
      Seq((900001L, java.lang.Double.valueOf(Double.NaN)),
          (900002L, null.asInstanceOf[java.lang.Double]))
        .toDF("doc_id", "q2")
        .select($"doc_id", lit("x").as("text"), lit(null).cast("string").as("lang"),
          lit(null).cast("string").as("source"), lit(1L).as("n_chars"),
          $"q2".as("quality"), lit(1L).as("cost")))
    val selected = Sampling
      .selectByBudget(withBad, "quality", "cost", "doc_id", total + 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!selected.contains(900001L) && !selected.contains(900002L))
    assert(selected.size == docs.count())
    // The narrow variant returns the SAME (id, score, cost) rows as
    // filtering the payload variant — including the all-kept, none-kept,
    // and mid-partition-cutoff budgets — without re-scanning the payload.
    for (budget <- Seq(0L, 1L, 500L, 5000L, 20000L, total)) {
      val wide = Sampling
        .selectByBudget(scored, "quality", "cost", "doc_id", budget)
        .select($"doc_id".cast("long"), $"quality".cast("double"),
          $"cost".cast("long"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      val nar = Sampling
        .selectByBudgetNarrow(scored, "quality", "cost", "doc_id", budget)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      assert(nar == wide, s"narrow/wide mismatch at budget $budget")
    }

    // Null id and null cost: a null (or non-castable) id is unrankable
    // and dropped by BOTH variants; a null cost sums as 0 for the budget
    // and surfaces as NULL in both outputs.
    val withNulls = scored.select($"doc_id", $"quality", $"cost")
      .unionByName(Seq(
        (null.asInstanceOf[java.lang.Long], 99.0, java.lang.Long.valueOf(5L)),
        (java.lang.Long.valueOf(910001L), 98.0,
          null.asInstanceOf[java.lang.Long]))
        .toDF("doc_id", "quality", "cost"))
    for (budget <- Seq(1L, 500L, total)) {
      val wide = Sampling
        .selectByBudget(withNulls, "quality", "cost", "doc_id", budget)
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toSet
      val nar = Sampling
        .selectByBudgetNarrow(withNulls, "quality", "cost", "doc_id", budget)
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toSet
      assert(nar == wide, s"narrow/wide null mismatch at budget $budget")
      // The null-id row (score 99.0) is unrankable in both variants.
      assert(!wide.exists(_._2 == 99.0))
      if (budget >= 500L) {
        // The null-cost row is rankable (its cost budgets as 0) and must
        // carry its NULL cost through both outputs.
        assert(wide.contains((910001L, 98.0, null)))
      }
    }
  }

  test("pii detection counts and redaction on planted identifiers") {
    val rows = Seq(
      (1L, "contact john.doe+spam@example.co.uk or admin@host.io today"),
      (2L, "server at 10.0.255.3 and 192.168.1.1, ssn 123-45-6789"),
      (3L, "numeric local part 1.2.3.4@mail.com stays one email"),
      (4L, "clean text with no identifiers at all"),
      (5L, "not an ip 1234.5.6.7890 but 11-22-3333 is not an ssn either")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiCounts($"text")
      .foldLeft(rows) { case (acc, (name, c)) => acc.withColumn(name, c) }
      .withColumn("redacted", TextAnalysis.redactPii($"text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5)))).toMap
    assert(out(1L) == ((2, 0, 0, "contact <email> or <email> today")))
    assert(out(2L) == ((0, 2, 1, "server at <ipv4> and <ipv4>, ssn <ssn>")))
    // Counts are independent per pattern on the raw text (the ipv4-shaped
    // local part IS counted), but redaction runs emails first, so it never
    // surfaces as a separate <ipv4> in the redacted output.
    assert(out(3L) == ((1, 1, 0, "numeric local part <email> stays one email")))
    assert(out(4L)._4 == "clean text with no identifiers at all")
    assert(out(5L)._1 == 0 && out(5L)._3 == 0)
  }

  test("boilerplate fraction flags corpus-common ngrams per document") {
    val tiny = Seq(
      (1L, "nav bar home about us content one"),
      (2L, "nav bar home about us content two"),
      (3L, "nav bar home about us different words here"),
      (4L, "completely unrelated text with no shared spans"),
      (5L, "ab")  // too short for a 3-gram
    ).toDF("doc_id", "text")
    val out = TextAnalysis
      .boilerplateNgramFraction(tiny, "doc_id", "text", n = 3, minDf = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // "nav bar home", "bar home about", "home about us" appear in docs
    // 1,2,3 (df=3); "about us content" only in 1,2 (df=2 < 3).
    assert(out(1L) == ((5L, 3L, 0.6)))
    assert(out(2L) == ((5L, 3L, 0.6)))
    assert(out(3L)._2 == 3L)
    assert(out(4L) == ((5L, 0L, 0.0)))
    assert(out(5L) == ((0L, 0L, 0.0)), "short docs keep fraction 0")
    assert(out.size == 5, "every document is annotated")
  }

  test("mixture rebalancing hits target proportions by downsampling only") {
    val targets = Map("src0" -> 0.6, "src1" -> 0.2, "src2" -> 0.2)
    val out = Sampling.rebalanceStrata(docs, "source", "doc_id", targets)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Only targeted sources survive.
    assert(out.keySet.subsetOf(targets.keySet))
    // Uniform input (25 docs/source at sf0.001): src0 binds at 25/0.6,
    // so src0 keeps everything and the others downsample toward 1/3 of
    // it. Hash sampling is approximate at n=25 — check proportions
    // loosely and the binding stratum exactly.
    assert(out("src0") == 25L, "the binding stratum keeps every row")
    assert(out("src1") < 25L && out("src2") < 25L,
      "non-binding strata must downsample")
    // No row outside the targeted strata, and determinism across
    // partitionings.
    val again = Sampling
      .rebalanceStrata(docs.repartition(7), "source", "doc_id", targets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val once = Sampling.rebalanceStrata(docs, "source", "doc_id", targets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == again, "membership must be partitioning-independent")
    // Unknown-only targets select nothing instead of dividing by zero.
    assert(Sampling.rebalanceStrata(docs, "source", "doc_id",
      Map("nope" -> 1.0)).count() == 0)
  }

  test("ngram doc frequencies count each document once per ngram") {
    val tiny = Seq(
      (1L, "a b a b"), // bigrams {a b, b a} — each counted once
      (2L, "a b c"),   // {a b, b c}
      (3L, "x y")      // {x y}
    ).toDF("doc_id", "text")
    val freqs = TextAnalysis.ngramDocFrequencies(tiny, "text", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freqs == Map("a b" -> 2L, "b a" -> 1L, "b c" -> 1L, "x y" -> 1L))
  }

  test("topTermsByDocFreq ranks by doc frequency with lexical ties") {
    val tiny = Seq(
      (1L, "en", "apple banana apple"),
      (2L, "en", "apple cherry"),
      (3L, "en", "banana cherry"),
      (4L, "fr", "pomme banane")
    ).toDF("doc_id", "lang", "text")
    val top = TextAnalysis.topTermsByDocFreq(tiny, "lang", "text", 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    // en: apple/banana/cherry all df=2 — lexical tie-break keeps apple,
    // banana; fr: both df=1, banane before pomme.
    assert(top.toSet == Set(("en", "apple", 2L, 1), ("en", "banana", 2L, 2),
      ("fr", "banane", 1L, 1), ("fr", "pomme", 1L, 2)))
  }

  test("unigramXent fits an add-one model and scores in token order") {
    val tiny = Seq((1L, "a a b"), (2L, "a b c"), (3L, " "))
      .toDF("doc_id", "text")
    // counts: a=3, b=2, c=1; N=6; vocabSize=2 → V={a,b}; denom = ln 9;
    // lp(a) = ln4 − ln9, lp(b) = ln3 − ln9, oov = −ln9.
    val got = TextAnalysis.unigramXent(tiny, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L), "the token-less document must be omitted")
    val ln9 = math.log(9.0)
    def xent(lps: Seq[Double]) = -lps.sum / (lps.length * math.log(2.0))
    val e1 = xent(Seq(math.log(4.0) - ln9, math.log(4.0) - ln9,
      math.log(3.0) - ln9))
    val e2 = xent(Seq(math.log(4.0) - ln9, math.log(3.0) - ln9, -ln9))
    assert(got(1L)._1 == 3 && math.abs(got(1L)._2 - e1) < 1e-12)
    assert(got(2L)._1 == 3 && math.abs(got(2L)._2 - e2) < 1e-12)
  }

  test("unigramXent on an all-empty corpus returns an empty frame, not an NPE") {
    val blank = Seq((1L, ""), (2L, "   "), (3L, "      "))
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramXent(blank, "doc_id", "text")
    assert(got.collect().isEmpty)
    assert(got.columns.toSeq == Seq("doc_id", "n_tokens", "xent_bits"))
    // And a fully empty input frame too.
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.unigramXent(none, "doc_id", "text").collect().isEmpty)
  }

  test("text analysis signals are sane on real documents") {
    val annotated = TextAnalysis.annotate(docs, "text").cache()
    val n = annotated.count()
    assert(annotated.where($"n_tokens" > 0).count() == n)
    assert(annotated.where($"quality" >= 0 && $"quality" <= 1).count() == n)
    assert(annotated.where(length($"fingerprint") === 32).count() == n)
    // The corpus is English word salad: langId should mostly say "en".
    val en = annotated.where($"lang_id" === "en").count()
    assert(en > n / 2, s"expected mostly en, got $en of $n")
    annotated.unpersist()
  }

  test("token counts match a reference computation") {
    val rows = docs.limit(50)
      .select($"text", TextAnalysis.tokenCount($"text").as("tc"))
      .collect()
    rows.foreach { r =>
      val expected = r.getString(0).trim.split("\\s+").count(_.nonEmpty)
      assert(r.getInt(1) == expected)
    }
  }

  test("repetition signals: known documents produce exact fractions") {
    import spark.implicits._
    val cases = Seq(
      // 4 lines, "nav bar" duplicated (2 occurrences x 7 chars = 14 of 25).
      ("nav bar\nunique1\nnav bar\nbody", 14.0 / 25.0),
      ("a\nb\nc", 0.0),
      ("", 0.0),
      ("   \n \n  ", 0.0), // only blank lines
      ("same\nsame\nsame", 1.0))
    val lineRows = cases.map(_._1).toDF("text")
      .select(TextAnalysis.duplicateLineCharFraction($"text").as("f"))
      .collect().map(_.getDouble(0))
    cases.map(_._2).zip(lineRows).foreach { case (exp, got) =>
      assert(math.abs(got - math.floor(exp * 10000) / 10000) < 1e-9,
        s"expected $exp, got $got")
    }

    val gramCases = Seq(
      // "a b" appears 3x among 4 2-grams -> 2 repeats of 4.
      ("a b a b a", 2.0 / 4.0),
      ("loop loop loop loop", 2.0 / 3.0), // "loop loop" x3 -> 2 repeats
      ("all words differ here", 0.0),
      ("one", 0.0), // fewer than n words
      ("", 0.0))
    val gramRows = gramCases.map(_._1).toDF("text")
      .select(TextAnalysis.duplicateNgramFraction($"text", 2).as("f"))
      .collect().map(_.getDouble(0))
    gramCases.map(_._2).zip(gramRows).foreach { case (exp, got) =>
      assert(math.abs(got - math.floor(exp * 10000) / 10000) < 1e-9,
        s"expected $exp, got $got")
    }
  }

  test("cosine expression is bit-identical to the higher-order fold") {
    // The HOF formulation the expression replaced: f64 left fold in array
    // order. Any FP reordering would shift floor-scaled oracle cosines.
    def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
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
    val pairs = embeddings.limit(100).select($"vec_id", $"embedding")
      .crossJoin(broadcast(embeddings.limit(7)
        .select($"vec_id".as("qid"), $"embedding".as("qv"))))
    val mismatches = pairs
      .select(Dedup.cosine($"embedding", $"qv").as("fast"),
        hofCosine($"embedding", $"qv").as("ref"))
      .where(not($"fast" <=> $"ref"))
      .count()
    assert(mismatches == 0, "codegen cosine diverged from the HOF fold")
    // Null semantics match zip_with padding: length mismatch / null -> null.
    val edge = Seq(
      (Seq(1f, 2f), Seq(1f, 2f, 3f)), // length mismatch
      (Seq(1f, 0f), Seq(0f, 1f))      // orthogonal -> 0.0
    ).toDF("a", "b")
      .select(Dedup.cosine($"a", $"b").as("c")).collect()
    assert(edge(0).isNullAt(0))
    assert(edge(1).getDouble(0) == 0.0)
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.graft.ColumnBridge
    assert(!CosineSimilarity(ColumnBridge.expression($"a"),
      ColumnBridge.expression($"b")).isInstanceOf[CodegenFallback])
  }

  test("term_frequencies equals the higher-order filter formulation and codegens") {
    import org.apache.spark.sql.graft.ColumnBridge
    val terms = Seq("the", "data", "zz_absent", "the") // duplicate keeps slot 0
    val toks = filter(split(lower(trim($"text")), "\\s+"), w => w =!= lit(""))
    val tf = ColumnBridge.column(
      TermFrequencies(ColumnBridge.expression($"__ws"), terms))
    val rows = docs.limit(200)
      .select($"doc_id", toks.as("__ws"))
      .select(Seq($"doc_id", tf.as("tf")) ++
        terms.zipWithIndex.map { case (t, i) =>
          size(filter($"__ws", w => w === lit(t))).as(s"ref_$i")
        }: _*)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val got = r.getSeq[Int](1)
      assert(got(0) == r.getInt(2), s"tf(the) mismatch for doc ${r.getLong(0)}")
      assert(got(1) == r.getInt(3))
      assert(got(2) == 0 && got(2) == r.getInt(4))
      // Duplicate query term: first slot takes all occurrences.
      assert(got(3) == 0)
    }
    // Codegen path: the expression must not be CodegenFallback, and empty /
    // null-element arrays must be safe in both eval modes.
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val e = TermFrequencies(ColumnBridge.expression($"__ws"), terms)
    assert(!e.isInstanceOf[CodegenFallback])
    val edge = Seq((1L, Seq("the", "the")), (2L, Seq.empty[String]))
      .toDF("id", "__ws")
      .select(ColumnBridge.column(
        TermFrequencies(ColumnBridge.expression($"__ws"), terms)).as("tf"))
      .collect().map(_.getSeq[Int](0))
    assert(edge(0) == Seq(2, 0, 0, 0) && edge(1) == Seq(0, 0, 0, 0))
  }

  test("vocab_hit_count equals the higher-order array_contains formulation") {
    val vocab = TextAnalysis.stopwords("en")
    val vocabArr = array(vocab.map(lit): _*)
    val toks = split(lower(trim($"text")), "\\s+")
    val edge = Seq((9000001L, ""), (9000002L, "   "), (9000003L, "the the a"))
      .toDF("doc_id", "text")
    val mism = docs.limit(300).select($"doc_id", $"text").union(edge)
      .select(
        TextAnalysis.vocabularyHits($"text", vocab).as("fast"),
        size(filter(toks, w => array_contains(vocabArr, w))).as("ref"))
      .where(not($"fast" <=> $"ref"))
      .count()
    assert(mism == 0, "vocab_hit_count diverged from the HOF formulation")
  }

  test("bm25 tokenization without the higher-order filter matches it") {
    // The CASE WHEN tokenization in bm25TopK must agree with
    // filter(split(...), != "") on every document, including edge shapes.
    val edge = Seq((1L, ""), (2L, "   "), (3L, " a  b\tc "), (4L, "one"))
      .toDF("doc_id", "text")
    val corpus = docs.limit(200).select($"doc_id", $"text").union(edge)
    val trimmed = lower(trim($"text"))
    val fast = when(length(trimmed) === 0, array().cast("array<string>"))
      .otherwise(split(trimmed, "\\s+"))
    val slow = filter(split(trimmed, "\\s+"), w => w =!= lit(""))
    assert(corpus.where(not(fast <=> slow)).count() == 0)
  }

  test("sampleKPerStratum: exact k, key-determined, stable under growth") {
    val in = (1L to 100L).map(i => (s"s${i % 3}", i)).toDF("src", "id")
    val got = Sampling.sampleKPerStratum(in, "src", "id", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.groupBy(_._1).forall(_._2.size == 5))
    // Partitioning-independent.
    val re = Sampling.sampleKPerStratum(in.repartition(13), "src", "id", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(re == got)
    // Reservoir semantics under growth: with new rows added, a previously
    // selected row leaves ONLY if a new row hashes ahead of it — the
    // surviving intersection is exactly the old selection minus those
    // displaced (never a reshuffle of the old order).
    val grown = in.union(Seq(("s0", 101L), ("s1", 102L)).toDF("src", "id"))
    val g2 = Sampling.sampleKPerStratum(grown, "src", "id", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(g2.groupBy(_._1).forall(_._2.size == 5))
    assert((g2 -- got).forall(t => t._2 > 100L),
      "only newly added rows may enter the selection")
    // Small strata keep everything.
    val tiny = Seq(("t", 1L), ("t", 2L)).toDF("src", "id")
    assert(Sampling.sampleKPerStratum(tiny, "src", "id", k = 5).count() == 2)
  }

  test("semanticDedup keeps one exemplar per dense neighborhood") {
    // Three exact copies of one direction, one near-copy, and two
    // orthogonal singletons. The copies/near-copy collapse to the
    // lowest-id exemplar; orthogonal rows are never flagged.
    val v1 = Array(1f, 0f, 0f, 0f)
    val near = Array(0.99f, 0.14f, 0f, 0f)
    val v2 = Array(0f, 1f, 0f, 0f)
    val v3 = Array(0f, 0f, 1f, 0f)
    val in = Seq(
      (1L, v1), (2L, v1), (3L, v1), (4L, near), (10L, v2), (20L, v3)
    ).toDF("id", "vec")
    val out = Dedup.semanticDedup(in, "id", "vec", nCells = 3, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    // Exemplars are never dups.
    out.foreach { case (id, (rep, dup)) => if (id == rep) assert(!dup) }
    // Copies and the near-copy share a cell with id 1 (identical cosine to
    // every centroid => same assignment) and are flagged against it.
    assert(out(2) == (1L, true) && out(3) == (1L, true))
    assert(out(4)._2, "near-copy above threshold must be flagged")
    // Orthogonal singletons: never flagged against a rep they don't match.
    Seq(10L, 20L).foreach { id =>
      val (rep, dup) = out(id)
      if (rep != id) assert(!dup, s"orthogonal row $id flagged against $rep")
    }
  }

  test("packChunks: concat-and-chunk assignment, spillover, determinism") {
    // Stratum s: tokens 1000,1000,100,2000,48,5000 with budget 2048.
    // prev-cumsums 0,1000,2000,2100,4100,4148 → chunks 0,0,0,1,2,2.
    val in = Seq(
      ("s", 1L, 1000L), ("s", 2L, 1000L), ("s", 3L, 100L),
      ("s", 4L, 2000L), ("s", 5L, 48L), ("s", 6L, 5000L),
      ("t", 10L, 3000L) // longer than a chunk: alone in chunk 0
    ).toDF("src", "id", "toks")
    val got = Sampling.packChunks(in, "src", "id", "id", "toks", 2048L)
      .orderBy("src", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("s", 1L, 0L), ("s", 2L, 0L), ("s", 3L, 0L),
      ("s", 4L, 1L), ("s", 5L, 2L), ("s", 6L, 2L),
      ("t", 10L, 0L)))
    // Partitioning-independent: a different physical layout assigns
    // identically (the window is keyed on the stratum, never on layout).
    val re = Sampling.packChunks(in.repartition(7), "src", "id", "id",
        "toks", 2048L)
      .orderBy("src", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(re.toSeq == got.toSeq)
  }

  test("multimodal stub pipeline preserves schema and determinism") {
    val assets = Multimodal.synthesizeAssets(docs, "doc_id", "text", "image")
    // Compare names/types; nullability differs by construction path.
    assert(assets.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Multimodal.assetSchema.map(f => (f.name, f.dataType.simpleString)))
    val decoded = Multimodal.decodeAndFeaturize(assets, dim = 16)
    val rows = decoded.collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val features = r.getSeq[Float](5)
      assert(features.length == 16)
      assert(math.abs(features.sum - 1.0f) < 1e-3f) // L1-normalized histogram
    }
    // Determinism: second run produces identical features.
    val again = Multimodal.decodeAndFeaturize(assets, dim = 16).collect()
    assert(again.map(_.getSeq[Float](5)).toSeq == rows.map(_.getSeq[Float](5)).toSeq)

    val resized = Multimodal.resizePlan(assets, 256)
    assert(resized.where($"resize.target_width" > 256).count() == 0)

    val videos = Multimodal.synthesizeAssets(docs.limit(10), "doc_id", "text", "video")
    val frames = Multimodal.frameSamplePlan(videos, everyMs = 1000L)
    assert(frames.where($"n_frames" < 1).count() == 0)
  }
}
