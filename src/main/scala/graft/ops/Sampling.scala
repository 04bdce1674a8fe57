package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training corpora.
  *
  * Splits must be a pure function of the record key — stable across runs,
  * executor counts, and partitionings, so train/val/test membership never
  * drifts between pipeline runs (`df.sample` is none of these). The hash
  * is a Knuth multiplicative hash over plain 64-bit integer arithmetic, so
  * any engine can replay membership with two SQL operators — the same
  * discipline that keeps the LSH operators oracle-checkable.
  *
  * Scale shape: a codegen'd scalar expression on the scan — no shuffle, no
  * state; a split assignment of 100 TB is exactly a filtered scan.
  */
object Sampling {

  /** Multiplier from Knuth's multiplicative method (2^32 / phi). */
  private val Mult = 2654435761L

  /** Keys are folded below 2^31 first so `(key + seed) * Mult` stays far
    * from Long overflow — Spark would wrap silently where another engine
    * errors, and the replayed arithmetic must agree everywhere.
    */
  private val KeyMod = 2147483647L

  /** Bucket granularity: fractions resolve to 1e-6. */
  val Buckets = 1000000L

  /** Deterministic bucket in [0, Buckets) for a key column; `seed` (keep
    * it under ~1e9) derives independent assignments for independent
    * sampling decisions.
    */
  def splitBucket(key: Column, seed: Long = 0L): Column = {
    require(seed >= 0 && seed <= 1000000000L, "seed must be in [0, 1e9]")
    pmod((pmod(key.cast("long"), lit(KeyMod)) + lit(seed)) * lit(Mult), lit(Buckets))
  }

  /** Assign each row a named split by cumulative fraction — e.g.
    * `Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01)`. Fractions must
    * sum to 1 (every row belongs somewhere).
    */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], seed: Long = 0L): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0))
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val bucket = splitBucket(col(keyCol), seed)
    val thresholds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(f => math.round(f * Buckets))
    val assigned = splits.zip(thresholds).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), hi)) => when(acc.isNull && bucket < hi, name)
        .otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** Keep a deterministic `fraction` of rows by key. */
  def sampleByKey(df: DataFrame, keyCol: String, fraction: Double,
      seed: Long = 0L): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.where(splitBucket(col(keyCol), seed) < math.round(fraction * Buckets))
  }

  /** Per-stratum deterministic fractions (e.g. downsample boilerplate-heavy
    * languages); strata absent from the map are dropped.
    */
  def stratifiedSampleByKey(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], seed: Long = 0L): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1))
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(math.round(f * Buckets)))
          .otherwise(acc)
      }
    df.where(splitBucket(col(keyCol), seed) < threshold)
  }

  /** Rebalance a corpus to target stratum proportions by DOWNSAMPLING
    * only (never duplicating): the output size is the largest T where
    * every stratum can still supply `target_s * T` rows
    * (`T = min_s count_s / target_s`), each stratum keeps the
    * deterministic hash fraction `target_s * T / count_s`, and strata
    * absent from `targets` are dropped. The standard "data mixing" step
    * that turns a crawl's accidental source distribution into the
    * training mixture.
    *
    * Scale shape: one tiny per-stratum count aggregate (bounded by the
    * number of strata) to compute fractions, then a shuffle-free hash
    * filter on the scan — rebalancing 100 TB is two passes, one of them
    * metadata-sized.
    */
  def rebalanceStrata(df: DataFrame, strataCol: String, keyCol: String,
      targets: Map[String, Double], seed: Long = 0L): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0))
    val counts = df.groupBy(strataCol).count().collect()
      .flatMap(r => Option(r.get(0)).map(s => s.toString -> r.getLong(1)))
      .toMap
    val present = targets.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    if (present.isEmpty) return df.where(lit(false))
    val total = present.map { case (s, w) => counts(s).toDouble / w }.min
    // The binding stratum's fraction is 1 up to an ulp of float noise;
    // the clamp cannot change any bucket threshold (round() absorbs it).
    val fractions = present.map { case (s, w) =>
      s -> math.min(1.0, w * total / counts(s))
    }
    stratifiedSampleByKey(df, strataCol, keyCol, fractions, seed)
  }

  /** Keep the best-scoring rows until a global cost budget is exhausted —
    * the "top documents until N tokens" selection every corpus pipeline
    * runs before training. Rows are ranked by (`scoreCol` DESC, `idCol`
    * ASC); a row is kept iff the summed cost of all rows ranked strictly
    * before it is < `budget` (so the crossing row is included and the
    * result is never empty while budget > 0). Exactly equivalent to
    * `QUALIFY sum(cost) OVER (ORDER BY score DESC, id) - cost < budget`.
    *
    * Scale shape: the payload is NEVER sorted or shuffled. A narrow
    * (score, cost, id) projection is range-partitioned on the rank order;
    * per-partition cost totals (one row per partition) prefix-scan on the
    * driver to locate the budget-crossing partition; only that single
    * partition is scanned to find the cutoff row. The selection then
    * collapses to a scan predicate on the original frame —
    * `score > s* OR (score = s* AND id <= i*)` — which pushes down to the
    * Parquet reader. Selecting from 100 TB costs one narrow-column
    * shuffle plus one filtered scan.
    *
    * `scoreCol` must be numeric and non-null/non-NaN rows are ranked;
    * null/NaN scores are never selected. `idCol` must be a unique integer
    * key (the deterministic tiebreak); `costCol` non-negative.
    */
  /** Exactly `k` deterministic rows per stratum — the "fixed eval set per
    * language/source" selection. Rows are ranked inside each stratum by
    * (hash(key), key) and the first `k` kept, so membership is a pure
    * function of the key: stable across runs, partitionings, and corpus
    * GROWTH — a row already selected stays selected unless a new row
    * hashes ahead of it, matching reservoir-sampling semantics without
    * any state. Strata with fewer than `k` rows keep everything.
    *
    * Scale shape: one keyed window whose rank predicate Spark executes as
    * WindowGroupLimit — a per-partition top-k that never materializes a
    * stratum's full sort, then one shuffle of the survivors (≤ k per
    * stratum) for the final rank.
    */
  def sampleKPerStratum(df: DataFrame, strataCol: String, keyCol: String,
      k: Int, seed: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(splitBucket(col(keyCol), seed), col(keyCol))
    df.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k)
      .drop("__rank")
  }

  /** Concat-and-chunk sequence packing: within each stratum, documents in
    * `orderCol` order are conceptually concatenated and chopped into
    * fixed `budget`-token training chunks; each document is assigned to
    * the chunk containing its FIRST token (`chunk = floor(prev_cumsum /
    * budget)` — docs longer than a chunk span forward, the standard
    * GPT-style packing-with-spillover). Deterministic and replayable with
    * one window function in any SQL engine.
    *
    * Returns the narrow assignment frame (`strataCol`, `idCol`,
    * `tokensCol`, `chunk`) — callers join back by id if the payload is
    * needed. Scale shape: only the narrow (strata, order, tokens)
    * projection goes through the single keyed window shuffle (one
    * partition per stratum, never a global sort); the payload never
    * moves.
    */
  def packChunks(df: DataFrame, strataCol: String, orderCol: String,
      idCol: String, tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, "chunk budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(strataCol), col(orderCol), col(idCol),
        col(tokensCol).cast("long").as(tokensCol))
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      // SQL `div`: exact BIGINT division (a float division would round
      // past 2^53 — reachable token totals at corpus scale).
      .withColumn("__prev", col("__cum") - col(tokensCol))
      .select(col(strataCol), col(idCol), col(tokensCol),
        expr(s"__prev div ${budget}L").as("chunk"))
  }

  def selectByBudget(df: DataFrame, scoreCol: String, costCol: String,
      idCol: String, budget: Long): DataFrame = {
    val score = col(scoreCol).cast("double")
    // A row without a rankable (score, id) pair cannot be ordered by the
    // (score desc, id asc) tie-break: null/NaN scores AND null (or
    // non-castable) ids are excluded up front — identically here and in
    // the narrow variant, which share the cutoff machinery.
    val rankable = score.isNotNull && !isnan(score) &&
      col(idCol).cast("long").isNotNull
    if (budget <= 0L) return df.where(lit(false))
    budgetCutoff(df, scoreCol, costCol, idCol, budget) match {
      case BudgetAll => df.where(rankable)
      case BudgetNone => df.where(lit(false))
      case BudgetAt(s, i) =>
        df.where(rankable && (score > s ||
          (score === s && col(idCol).cast("long") <= i)))
    }
  }

  /** [[selectByBudget]] when the caller only needs the NARROW selection
    * (`idCol` BIGINT, `scoreCol` DOUBLE, `costCol` BIGINT): the kept rows
    * are read straight off the already-shuffled narrow frame — the
    * payload table is scanned ONCE (for the narrow projection) instead of
    * twice, which matters when the score/cost columns are expensive
    * derived expressions (text quality metrics, token counts). Values are
    * identical to filtering [[selectByBudget]]'s result down to the three
    * columns.
    */
  def selectByBudgetNarrow(df: DataFrame, scoreCol: String, costCol: String,
      idCol: String, budget: Long): DataFrame = {
    val spark = df.sparkSession
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(idCol,
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(scoreCol,
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField(costCol,
        org.apache.spark.sql.types.LongType)))
    if (budget <= 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    val (ranged, cut) = budgetCutoffRanged(df, scoreCol, costCol, idCol, budget)
    val kept = cut match {
      case BudgetNone => spark.sparkContext.emptyRDD[org.apache.spark.sql.Row]
      case BudgetAll => ranged
      case BudgetAt(s, i) =>
        // The shuffled frame is globally ordered (score desc, id asc), so
        // the kept set is a prefix: everything strictly above the cutoff
        // row plus the cutoff row itself.
        ranged.mapPartitions(_.filter(r =>
          r.getDouble(0) > s || (r.getDouble(0) == s && r.getLong(2) <= i)))
    }
    spark.createDataFrame(
      kept.map(r => org.apache.spark.sql.Row(r.getLong(2), r.getDouble(0),
        if (r.isNullAt(1)) null else r.getLong(1))),
      outSchema)
  }

  private sealed trait BudgetCut
  private case object BudgetAll extends BudgetCut
  private case object BudgetNone extends BudgetCut
  private final case class BudgetAt(score: Double, id: Long) extends BudgetCut

  private def budgetCutoff(df: DataFrame, scoreCol: String, costCol: String,
      idCol: String, budget: Long): BudgetCut =
    budgetCutoffRanged(df, scoreCol, costCol, idCol, budget)._2

  /** Shared cutoff machinery: shuffle the narrow (score, cost, id)
    * projection once by range, locate the budget-crossing row with two
    * bounded jobs over the SAME shuffle (RDD-level reuse skips the
    * completed map stage), and return the shuffled RDD plus the cutoff.
    */
  private def budgetCutoffRanged(df: DataFrame, scoreCol: String,
      costCol: String, idCol: String, budget: Long)
      : (org.apache.spark.rdd.RDD[org.apache.spark.sql.Row], BudgetCut) = {
    val score = col(scoreCol).cast("double")
    val rankable = score.isNotNull && !isnan(score) &&
      col(idCol).cast("long").isNotNull
    // Cost stays NULLABLE (null sums as 0 below, and the narrow output
    // must surface the original null, as the wide variant's rows do).
    val narrow = df.where(rankable).select(
      score.as("__s"), col(costCol).cast("long").as("__c"),
      col(idCol).cast("long").as("__i"))
    val p = math.max(1, narrow.sparkSession.sessionState.conf.numShufflePartitions)
    val ranged = narrow
      .repartitionByRange(p, col("__s").desc, col("__i").asc)
      .sortWithinPartitions(col("__s").desc, col("__i").asc)
    // RDD-level reuse: the second job over the same RDD skips the
    // completed shuffle map stage, so the narrow frame is shuffled once.
    val rdd = ranged.rdd

    val totals = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var t = 0L
        it.foreach(r => t += (if (r.isNullAt(1)) 0L else r.getLong(1)))
        Iterator.single((i, t))
      }
      .collect().sortBy(_._1).map(_._2) // bounded: one Long per partition
    val grandTotal = totals.sum
    if (grandTotal <= budget) return (rdd, BudgetAll)

    // The budget crosses inside partition k (ranges are globally ordered).
    var k = 0
    var offset = 0L
    while (offset + totals(k) < budget) { offset += totals(k); k += 1 }
    val partOffset = offset
    val crossing = k
    val cutoff = rdd
      .mapPartitionsWithIndex { (i, it) =>
        if (i != crossing) Iterator.empty
        else {
          var run = partOffset
          var last: Option[(Double, Long)] = None
          while (it.hasNext && run < budget) {
            val r = it.next()
            last = Some((r.getDouble(0), r.getLong(2)))
            run += (if (r.isNullAt(1)) 0L else r.getLong(1))
          }
          last.iterator
        }
      }
      .collect() // exactly one row: the last kept (score, id)
    cutoff.headOption match {
      case Some((s, i)) => (rdd, BudgetAt(s, i))
      case None => (rdd, BudgetNone) // crossing partition empty: nothing fits
    }
  }
}
